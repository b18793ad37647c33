"""Point cloud rigid/similarity alignment: Umeyama + ICP.

Parity: reference ops/points_alignment.py:243 (`corresponding_points_alignment`),
:38 (`iterative_closest_point`).  SVD runs via jnp.linalg (XLA); the ICP loop
is a bounded `fori`-style python loop at trace level with convergence
reported post-hoc (data-dependent early exit is host-side only).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .knn import knn_points
from .utils import convert_pointclouds_to_tensor, wmean


class SimilarityTransform(NamedTuple):
    R: jnp.ndarray  # (N, 3, 3)
    T: jnp.ndarray  # (N, 3)
    s: jnp.ndarray  # (N,)


class ICPSolution(NamedTuple):
    converged: bool
    rmse: Optional[jnp.ndarray]
    Xt: jnp.ndarray
    RTs: SimilarityTransform
    t_history: list


def corresponding_points_alignment(
    X,
    Y,
    weights: Optional[jnp.ndarray] = None,
    estimate_scale: bool = False,
    allow_reflection: bool = False,
    eps: float = 1e-9,
) -> SimilarityTransform:
    """Umeyama: argmin_{s,R,T} ||s(XR)+T - Y|| (reference :243).

    X, Y: (N, P, D) arrays or Pointclouds.  Row-vector convention:
    aligned = s * X @ R + T.
    """
    Xt, num_points_X = convert_pointclouds_to_tensor(X)
    Yt, num_points_Y = convert_pointclouds_to_tensor(Y)
    if Xt.shape != Yt.shape:
        raise ValueError("Point sets X and Y have to have the same shape.")
    N, P, dim = Xt.shape
    if weights is not None and weights.shape != (N, P):
        raise ValueError("weights must be (N, P)")

    # mask padded points into the weights
    mask = (
        jnp.arange(P, dtype=jnp.int32)[None, :] < num_points_X[:, None]
    ).astype(Xt.dtype)
    w = mask if weights is None else weights * mask

    Xmu = wmean(Xt, w, eps=eps)  # (N, 1, D)
    Ymu = wmean(Yt, w, eps=eps)
    Xc = Xt - Xmu
    Yc = Yt - Ymu

    total_weight = jnp.clip(jnp.sum(w, axis=1), eps)  # (N,)
    XYcov = jnp.einsum(
        "npi,npj->nij", Xc * w[..., None], Yc,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / total_weight[:, None, None]

    U, S, Vt = jnp.linalg.svd(XYcov)
    V = jnp.swapaxes(Vt, -1, -2)

    # reflection fix (det(U) det(V) < 0 -> flip last singular vector)
    E = jnp.ones((N, dim))
    if not allow_reflection:
        detUV = jnp.linalg.det(U) * jnp.linalg.det(V)
        E = E.at[:, -1].set(jnp.sign(detUV))
    R = jnp.einsum("nik,nk,njk->nij", U, E, V)  # U diag(E) V^T

    if estimate_scale:
        Xcov = jnp.sum(Xc * Xc * w[..., None], axis=(1, 2)) / total_weight
        s = jnp.sum(S * E, axis=1) / jnp.clip(Xcov, eps)
    else:
        s = jnp.ones((N,), Xt.dtype)

    T = Ymu[:, 0, :] - s[:, None] * jnp.einsum("ni,nij->nj", Xmu[:, 0, :], R)
    return SimilarityTransform(R=R, T=T, s=s)


def _apply_similarity_transform(X, R, T, s):
    return s[:, None, None] * jnp.einsum("npi,nij->npj", X, R) + T[:, None, :]


def iterative_closest_point(
    X,
    Y,
    init_transform: Optional[SimilarityTransform] = None,
    max_iterations: int = 100,
    relative_rmse_thr: float = 1e-6,
    estimate_scale: bool = False,
    allow_reflection: bool = False,
    verbose: bool = False,
) -> ICPSolution:
    """ICP aligning X to Y (reference ops/points_alignment.py:38)."""
    Xt, num_points_X = convert_pointclouds_to_tensor(X)
    Yt, num_points_Y = convert_pointclouds_to_tensor(Y)
    N, P, dim = Xt.shape
    mask_X = (
        jnp.arange(P, dtype=jnp.int32)[None, :] < num_points_X[:, None]
    ).astype(Xt.dtype)

    if init_transform is not None:
        R, T, s = init_transform
        Xt_cur = _apply_similarity_transform(Xt, R, T, s)
    else:
        R = jnp.tile(jnp.eye(dim, dtype=Xt.dtype)[None], (N, 1, 1))
        T = jnp.zeros((N, dim), Xt.dtype)
        s = jnp.ones((N,), Xt.dtype)
        Xt_cur = Xt

    if isinstance(Xt, jax.core.Tracer) or isinstance(Yt, jax.core.Tracer):
        # jit-safe path: fixed-length lax.scan with updates frozen once
        # converged (static shapes; `converged` is a traced bool).  The
        # eager path below keeps the reference's early-exit behavior.
        def step(carry, _):
            R, T, s, Xt_cur, prev_rmse, conv = carry
            knn = knn_points(
                Xt_cur, Yt, lengths1=num_points_X, lengths2=num_points_Y,
                K=1, return_nn=True,
            )
            Xt_nn = knn.knn[:, :, 0]
            sim = corresponding_points_alignment(
                Xt_cur, Xt_nn, weights=mask_X,
                estimate_scale=estimate_scale,
                allow_reflection=allow_reflection,
            )
            Xt_new = _apply_similarity_transform(Xt_cur, sim.R, sim.T, sim.s)
            R_new = jnp.einsum("nij,njk->nik", R, sim.R)
            T_new = (
                jnp.einsum("ni,nij->nj", T, sim.R) * sim.s[:, None] + sim.T
            )
            s_new = s * sim.s
            rmse = jnp.sqrt(
                jnp.sum(knn.dists[..., 0] * mask_X, axis=1)
                / jnp.clip(jnp.sum(mask_X, axis=1), 1.0)
            )
            rel = (prev_rmse - rmse) / jnp.clip(prev_rmse, 1e-12)
            conv_new = conv | jnp.all(rel <= relative_rmse_thr)
            # freeze state after convergence
            keep = lambda new, old: jnp.where(conv, old, new)
            carry = (
                keep(R_new, R), keep(T_new, T), keep(s_new, s),
                keep(Xt_new, Xt_cur), keep(rmse, prev_rmse), conv_new,
            )
            return carry, (keep(R_new, R), keep(T_new, T), keep(s_new, s))

        init = (
            R, T, s, Xt_cur,
            jnp.full((N,), jnp.inf, Xt.dtype), jnp.asarray(False),
        )
        (R, T, s, Xt_cur, rmse, converged), hist = jax.lax.scan(
            step, init, None, length=max_iterations
        )
        t_history = [
            SimilarityTransform(hist[0][i], hist[1][i], hist[2][i])
            for i in range(max_iterations)
        ]
        return ICPSolution(
            converged, rmse, Xt_cur, SimilarityTransform(R, T, s), t_history
        )

    prev_rmse = None
    rmse = None
    t_history = []
    converged = False
    for it in range(max_iterations):
        knn = knn_points(
            Xt_cur, Yt, lengths1=num_points_X, lengths2=num_points_Y, K=1,
            return_nn=True,
        )
        Xt_nn = knn.knn[:, :, 0]  # (N, P, D)
        sim = corresponding_points_alignment(
            Xt_cur,
            Xt_nn,
            weights=mask_X,
            estimate_scale=estimate_scale,
            allow_reflection=allow_reflection,
        )
        # compose: total transform mapping original X
        Xt_cur = _apply_similarity_transform(Xt_cur, sim.R, sim.T, sim.s)
        R = jnp.einsum("nij,njk->nik", R, sim.R)
        T = jnp.einsum("ni,nij->nj", T, sim.R) * sim.s[:, None] + sim.T
        s = s * sim.s
        t_history.append(SimilarityTransform(R, T, s))

        rmse = jnp.sqrt(
            jnp.sum(knn.dists[..., 0] * mask_X, axis=1)
            / jnp.clip(jnp.sum(mask_X, axis=1), 1.0)
        )
        if verbose:
            print(f"ICP iteration {it}: mean/max rmse = "
                  f"{float(rmse.mean()):1.2e}/{float(rmse.max()):1.2e}")
        if prev_rmse is not None:
            rel = (prev_rmse - rmse) / jnp.clip(prev_rmse, 1e-12)
            if bool((rel <= relative_rmse_thr).all()):
                converged = True
                break
        prev_rmse = rmse

    return ICPSolution(converged, rmse, Xt_cur, SimilarityTransform(R, T, s), t_history)
