"""Align two camera batches by a similarity transform.

Parity: reference ops/cameras_alignment.py:20
(`corresponding_cameras_alignment`, modes "centers" :148 / "extrinsics"
:168); same math, batched XLA linear algebra.
"""

from __future__ import annotations

import jax.numpy as jnp

from .points_alignment import corresponding_points_alignment


def _align_camera_centers(cameras_src, cameras_tgt, estimate_scale=True, eps=1e-9):
    centers_src = cameras_src.get_camera_center()
    centers_tgt = cameras_tgt.get_camera_center()
    align_t = corresponding_points_alignment(
        centers_src[None],
        centers_tgt[None],
        estimate_scale=estimate_scale,
        allow_reflection=False,
        eps=eps,
    )
    # camera transform is the inverse of the center transform (reference :160)
    align_t_R = jnp.swapaxes(align_t.R, -1, -2)[0]
    align_t_T = -(align_t.T[0] @ align_t_R)
    align_t_s = align_t.s[0]
    return align_t_R, align_t_T, align_t_s


def _align_camera_extrinsics(cameras_src, cameras_tgt, estimate_scale=True, eps=1e-9):
    # R_A solves R_A R_i = R_i' in the least-squares sense (reference :168)
    RRcov = jnp.mean(
        jnp.einsum("nij,nkj->nik", cameras_src.R, cameras_tgt.R), axis=0
    )
    U, _, Vt = jnp.linalg.svd(RRcov)
    align_t_R = Vt.T @ U.T

    A = jnp.einsum("nij,nj->ni", cameras_src.R, cameras_src.T)
    B = jnp.einsum("nij,nj->ni", cameras_src.R, cameras_tgt.T)
    Amu = A.mean(0)
    Bmu = B.mean(0)
    if estimate_scale:
        Ac = A - Amu
        Bc = B - Bmu
        align_t_s = jnp.sum(Ac * Bc) / jnp.clip(jnp.sum(Ac * Ac), eps)
    else:
        align_t_s = jnp.asarray(1.0)
    align_t_T = Bmu - Amu * align_t_s
    return align_t_R, align_t_T, align_t_s


def corresponding_cameras_alignment(
    cameras_src,
    cameras_tgt,
    estimate_scale: bool = True,
    mode: str = "extrinsics",
    eps: float = 1e-9,
):
    """Estimate a similarity aligning cameras_src to cameras_tgt
    (reference :20); returns the aligned copy of cameras_src."""
    if cameras_src.R.shape[0] != cameras_tgt.R.shape[0]:
        raise ValueError(
            "cameras_src and cameras_tgt have to contain the same number of cameras!"
        )
    if mode == "centers":
        align_fun = _align_camera_centers
    elif mode == "extrinsics":
        align_fun = _align_camera_extrinsics
    else:
        raise ValueError("mode has to be one of (centers, extrinsics)")

    align_t_R, align_t_T, align_t_s = align_fun(
        cameras_src, cameras_tgt, estimate_scale=estimate_scale, eps=eps
    )
    new_R = jnp.einsum("ij,njk->nik", align_t_R, cameras_src.R)
    new_T = (
        jnp.einsum("i,nij->nj", align_t_T, cameras_src.R)
        + cameras_src.T * align_t_s
    )
    return cameras_src.replace(R=new_R, T=new_T)
