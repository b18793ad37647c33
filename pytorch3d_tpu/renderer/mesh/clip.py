"""Near-plane (z) frustum clipping for mesh rasterization.

Parity: reference renderer/mesh/clip.py (4 cases :40-56, `clip_faces`
:324, `convert_clipped_rasterization_to_original_faces` :618).

TPU design: instead of dynamic face lists, every input face maps to TWO
static output slots (capacity 2F):
  case 1 (no vert clipped)  -> slot A = face,           slot B invalid
  case 2 (all clipped)      -> both slots invalid
  case 3 (2 verts clipped)  -> slot A = smaller tri,    slot B invalid
  case 4 (1 vert clipped)   -> quad split into slots A and B
Each output vertex carries its barycentric combination of the ORIGINAL
face's vertices, so rasterized barycentrics convert back with one matmul
(the reference's conversion, clip.py:618).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ClippedFaces(NamedTuple):
    face_verts: jnp.ndarray  # (2F, 3, 3)
    valid: jnp.ndarray  # (2F,)
    faces_clipped_to_unclipped_idx: jnp.ndarray  # (2F,) original face ids
    barycentric_conversion: jnp.ndarray  # (2F, 3, 3): rows = new verts as
    # barycentric combos of original verts


def clip_faces(
    face_verts: jnp.ndarray,  # (F, 3, 3) NDC xy + view z
    valid: jnp.ndarray,  # (F,)
    z_clip_value: float,
) -> ClippedFaces:
    F = face_verts.shape[0]
    z = face_verts[..., 2]  # (F, 3)
    clipped = z < z_clip_value  # (F, 3)
    n_clip = jnp.sum(clipped.astype(jnp.int32), axis=-1)  # (F,)

    eye = jnp.eye(3, dtype=face_verts.dtype)

    # rotation r: indices (r, r+1, r+2) % 3
    idx3 = jnp.arange(3)

    def rotate(r):
        return (r[:, None] + idx3[None, :]) % 3  # (F, 3)

    # --- case 3: exactly 2 clipped; kept vert index = argmin(clipped)
    kept_idx = jnp.argmin(clipped.astype(jnp.int32) * 2 - 1, axis=-1)
    # (argmin of +1/-1: kept verts have -1) -> first kept index
    perm3 = rotate(kept_idx.astype(jnp.int32))  # (F, 3) = (t, p1, p2)

    # --- case 4: exactly 1 clipped; clipped index
    clip_idx = jnp.argmax(clipped, axis=-1).astype(jnp.int32)
    perm4 = rotate((clip_idx + 1) % 3)  # (F, 3) = (t1, t2, p)

    gather = jax.vmap(lambda fv, p: fv[p])
    fv3 = gather(face_verts, perm3)  # (F, 3, 3) (t, p1, p2)
    fv4 = gather(face_verts, perm4)  # (F, 3, 3) (t1, t2, p)
    b3 = gather(jnp.broadcast_to(eye, (F, 3, 3)), perm3)  # bary rows
    b4 = gather(jnp.broadcast_to(eye, (F, 3, 3)), perm4)

    def intersect(a, b, ba, bb):
        """Point on segment a->b at z = z_clip + its barycentric row."""
        alpha = (z_clip_value - a[..., 2]) / jnp.where(
            jnp.abs(b[..., 2] - a[..., 2]) < 1e-12,
            1.0,
            b[..., 2] - a[..., 2],
        )
        alpha = jnp.clip(alpha, 0.0, 1.0)[..., None]
        return a + alpha * (b - a), ba + alpha * (bb - ba)

    # case 3 triangle: (t, i1, i2)
    t, p1, p2 = fv3[:, 0], fv3[:, 1], fv3[:, 2]
    bt, bp1, bp2 = b3[:, 0], b3[:, 1], b3[:, 2]
    i1, bi1 = intersect(t, p1, bt, bp1)
    i2, bi2 = intersect(t, p2, bt, bp2)
    tri_case3 = jnp.stack([t, i1, i2], axis=1)
    bar_case3 = jnp.stack([bt, bi1, bi2], axis=1)

    # case 4 quad: (t1, t2, j2), (t1, j2, j1) with j_k = intersect(t_k, p)
    t1, t2, p = fv4[:, 0], fv4[:, 1], fv4[:, 2]
    bt1, bt2, bp = b4[:, 0], b4[:, 1], b4[:, 2]
    j1, bj1 = intersect(t1, p, bt1, bp)
    j2, bj2 = intersect(t2, p, bt2, bp)
    tri_case4a = jnp.stack([t1, t2, j2], axis=1)
    bar_case4a = jnp.stack([bt1, bt2, bj2], axis=1)
    tri_case4b = jnp.stack([t1, j2, j1], axis=1)
    bar_case4b = jnp.stack([bt1, bj2, bj1], axis=1)

    ident_bar = jnp.broadcast_to(eye, (F, 3, 3))

    is0 = n_clip == 0
    is1 = n_clip == 1
    is2 = n_clip == 2
    is3 = n_clip == 3

    slotA = jnp.where(
        is2[:, None, None],
        tri_case3,
        jnp.where(is1[:, None, None], tri_case4a, face_verts),
    )
    barA = jnp.where(
        is2[:, None, None],
        bar_case3,
        jnp.where(is1[:, None, None], bar_case4a, ident_bar),
    )
    validA = valid & ~is3
    slotB = tri_case4b
    barB = bar_case4b
    validB = valid & is1

    face_verts_out = jnp.concatenate([slotA, slotB], axis=0)
    bar_out = jnp.concatenate([barA, barB], axis=0)
    valid_out = jnp.concatenate([validA, validB], axis=0)
    orig_idx = jnp.concatenate(
        [jnp.arange(F, dtype=jnp.int32), jnp.arange(F, dtype=jnp.int32)]
    )
    return ClippedFaces(
        face_verts=face_verts_out,
        valid=valid_out,
        faces_clipped_to_unclipped_idx=orig_idx,
        barycentric_conversion=bar_out,
    )


def convert_clipped_rasterization_to_original_faces(
    pix_to_face_clipped: jnp.ndarray,  # (..., K) ids into the 2F table
    bary_clipped: jnp.ndarray,  # (..., K, 3)
    clipped: ClippedFaces,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map sub-face ids/barycentrics back to the original faces
    (reference clip.py:618)."""
    sel = jnp.maximum(pix_to_face_clipped, 0)
    pix_to_face = jnp.where(
        pix_to_face_clipped >= 0,
        clipped.faces_clipped_to_unclipped_idx[sel],
        -1,
    )
    conv = clipped.barycentric_conversion[sel]  # (..., K, 3, 3)
    bary = jnp.einsum("...k,...kj->...j", bary_clipped, conv)
    bary = jnp.where(
        (pix_to_face_clipped >= 0)[..., None], bary, bary_clipped
    )
    return pix_to_face, bary


class ClipFrustum:
    """View-frustum description for clipping/culling (reference
    clip.py:99). Axis values left as None disable culling for that
    plane; `z_clip_value` enables near-plane triangle clipping (the
    behavior implemented by `clip_faces`)."""

    __slots__ = [
        "left",
        "right",
        "top",
        "bottom",
        "znear",
        "zfar",
        "perspective_correct",
        "cull",
        "z_clip_value",
    ]

    def __init__(
        self,
        left=None,
        right=None,
        top=None,
        bottom=None,
        znear=None,
        zfar=None,
        perspective_correct: bool = False,
        cull: bool = True,
        z_clip_value=None,
    ) -> None:
        self.left = left
        self.right = right
        self.top = top
        self.bottom = bottom
        self.znear = znear
        self.zfar = zfar
        self.perspective_correct = perspective_correct
        self.cull = cull
        self.z_clip_value = z_clip_value
