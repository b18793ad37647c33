"""Laplacian smoothing losses: uniform / cot / cotcurv.

Parity: reference loss/mesh_laplacian_smoothing.py:14.  Sparse matvecs are
expressed as segment sums over edges/faces (XLA scatter-add; transpose =
gather for the backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common.math_utils import safe_norm


def mesh_laplacian_smoothing(meshes, method: str = "uniform") -> jnp.ndarray:
    if meshes.isempty():
        return jnp.asarray(0.0, jnp.float32)
    N = len(meshes)
    verts = meshes.verts_packed()  # (V, 3)
    V = verts.shape[0]
    vmask = meshes.verts_packed_mask()
    v_to_mesh = meshes.verts_packed_to_mesh_idx()
    num_verts = meshes.num_verts_per_mesh().astype(jnp.float32)
    weights = jnp.where(
        vmask, 1.0 / jnp.clip(num_verts[jnp.maximum(v_to_mesh, 0)], 1.0), 0.0
    )

    if method == "uniform":
        edges = meshes.edges_packed()
        valid = jnp.all(edges >= 0, axis=-1)
        e0 = jnp.where(valid, edges[:, 0], 0)
        e1 = jnp.where(valid, edges[:, 1], 0)
        ones = valid.astype(verts.dtype)
        deg = jax.ops.segment_sum(ones, e0, num_segments=V)
        deg = deg + jax.ops.segment_sum(ones, e1, num_segments=V)
        nbr_sum = jax.ops.segment_sum(
            verts[e1] * ones[:, None], e0, num_segments=V
        ) + jax.ops.segment_sum(verts[e0] * ones[:, None], e1, num_segments=V)
        # L v = mean(neighbors) - v
        loss_vec = nbr_sum / jnp.clip(deg, 1.0)[:, None] - verts
        loss_vec = jnp.where((deg > 0)[:, None], loss_vec, 0.0)
    elif method in ("cot", "cotcurv"):
        faces = meshes.faces_packed()
        Lv, wsum, inv_areas = _cot_laplacian_apply(verts, faces)
        if method == "cot":
            loss_vec = Lv / jnp.clip(wsum, 1e-12)[:, None] - verts
            loss_vec = jnp.where((wsum > 0)[:, None], loss_vec, 0.0)
        else:  # cotcurv
            norm_w = 0.25 * inv_areas
            loss_vec = (Lv - wsum[:, None] * verts) * norm_w[:, None]
    else:
        raise ValueError("Method should be one of {uniform, cot, cotcurv}")

    loss = safe_norm(loss_vec, axis=1) * weights
    return jnp.sum(loss) / N


def _cot_laplacian_apply(verts, faces, eps: float = 1e-12):
    """Return (L @ verts, row sums of L, per-vertex inverse areas).

    Cotangent weights as in ops/laplacian_matrices.cot_laplacian, applied
    directly via segment sums (avoids materializing the sparse matrix).
    The weights (and areas) are computed under stop_gradient: the
    reference builds L inside `torch.no_grad()` ("treat it as a magic
    constant matrix", loss/mesh_laplacian_smoothing.py:106) — only the
    matvec L @ verts is differentiated.
    """
    V = verts.shape[0]
    valid = jnp.all(faces >= 0, axis=-1)
    f = jnp.maximum(faces, 0)
    verts_ng = jax.lax.stop_gradient(verts)
    v0, v1, v2 = verts_ng[f[:, 0]], verts_ng[f[:, 1]], verts_ng[f[:, 2]]
    A = safe_norm(v1 - v2, axis=1)
    B = safe_norm(v0 - v2, axis=1)
    C = safe_norm(v0 - v1, axis=1)
    A2, B2, C2 = A * A, B * B, C * C
    s = 0.5 * (A + B + C)
    area = jnp.sqrt(jnp.clip(s * (s - A) * (s - B) * (s - C), eps))
    cota = (B2 + C2 - A2) / jnp.clip(area, eps) / 4.0
    cotb = (A2 + C2 - B2) / jnp.clip(area, eps) / 4.0
    cotc = (A2 + B2 - C2) / jnp.clip(area, eps) / 4.0
    cots = [
        jnp.where(valid, c, 0.0) for c in (cota, cotb, cotc)
    ]

    Lv = jnp.zeros_like(verts)
    wsum = jnp.zeros((V,), verts.dtype)
    # weight w on pair (i, j): Lv[i] += w * v[j]; Lv[j] += w * v[i]
    for w, i, j in (
        (cots[0], f[:, 1], f[:, 2]),
        (cots[1], f[:, 2], f[:, 0]),
        (cots[2], f[:, 0], f[:, 1]),
    ):
        Lv = Lv + jax.ops.segment_sum(w[:, None] * verts[j], i, num_segments=V)
        Lv = Lv + jax.ops.segment_sum(w[:, None] * verts[i], j, num_segments=V)
        wsum = wsum + jax.ops.segment_sum(w, i, num_segments=V)
        wsum = wsum + jax.ops.segment_sum(w, j, num_segments=V)

    face_area = jnp.where(valid, area, 0.0)
    vert_area = (
        jax.ops.segment_sum(face_area, f[:, 0], num_segments=V)
        + jax.ops.segment_sum(face_area, f[:, 1], num_segments=V)
        + jax.ops.segment_sum(face_area, f[:, 2], num_segments=V)
    )
    inv_areas = jnp.where(vert_area > 0, 1.0 / jnp.clip(vert_area, eps), 0.0)
    return Lv, wsum, inv_areas
