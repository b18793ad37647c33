"""Mesh Laplacian matrices (uniform / cotangent / norm).

Parity: reference ops/laplacian_matrices.py:23 (`laplacian`), :73
(`cot_laplacian`), :144 (`norm_laplacian`).

TPU design: sparse matrices are `jax.experimental.sparse.BCOO` with *static*
nnz derived from the (padded) edge/face capacity — padded entries are
zero-valued duplicates at (0, 0), which is safe for the matmul/reduction
uses in the losses.  Degree/area accumulations are `segment_sum`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from ..common.math_utils import safe_norm


def laplacian(verts: jnp.ndarray, edges: jnp.ndarray) -> jsparse.BCOO:
    """Uniform Laplacian (V, V): L[i,j]=1/deg(i), L[i,i]=-1 (reference :23).

    edges: (E, 2) int32, -1 padded rows allowed.
    """
    V = verts.shape[0]
    valid = jnp.all(edges >= 0, axis=-1)
    e0 = jnp.where(valid, edges[:, 0], 0)
    e1 = jnp.where(valid, edges[:, 1], 0)

    ones = valid.astype(verts.dtype)
    deg = jax.ops.segment_sum(ones, e0, num_segments=V) + jax.ops.segment_sum(
        ones, e1, num_segments=V
    )
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.clip(deg, 1.0), 0.0)

    # off-diagonals both directions + diagonal
    rows = jnp.concatenate([e0, e1, jnp.arange(V, dtype=edges.dtype)])
    cols = jnp.concatenate([e1, e0, jnp.arange(V, dtype=edges.dtype)])
    vals = jnp.concatenate(
        [
            jnp.where(valid, inv_deg[e0], 0.0),
            jnp.where(valid, inv_deg[e1], 0.0),
            jnp.where(deg > 0, -jnp.ones((V,), verts.dtype), 0.0),
        ]
    )
    idx = jnp.stack([rows, cols], axis=1)
    return jsparse.BCOO((vals, idx), shape=(V, V))


def cot_laplacian(
    verts: jnp.ndarray, faces: jnp.ndarray, eps: float = 1e-12
) -> Tuple[jsparse.BCOO, jnp.ndarray]:
    """Cotangent Laplacian + 1/(sum face areas) per vert (reference :73).

    faces: (F, 3) int32, -1 padded rows allowed.
    Returns (L (V,V) BCOO with L[i,j]=cot(a_ij)+cot(b_ij), inv_areas (V,1)).
    """
    V = verts.shape[0]
    valid = jnp.all(faces >= 0, axis=-1)
    f = jnp.maximum(faces, 0)
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]

    A = safe_norm(v1 - v2, axis=1)
    B = safe_norm(v0 - v2, axis=1)
    C = safe_norm(v0 - v1, axis=1)

    A2, B2, C2 = A * A, B * B, C * C
    s = 0.5 * (A + B + C)
    area = jnp.sqrt(jnp.clip(s * (s - A) * (s - B) * (s - C), eps))
    cota = (B2 + C2 - A2) / jnp.clip(area, eps)  # opposite edge (v1,v2)
    cotb = (A2 + C2 - B2) / jnp.clip(area, eps)  # opposite edge (v0,v2)
    cotc = (A2 + B2 - C2) / jnp.clip(area, eps)  # opposite edge (v0,v1)
    cot = jnp.stack([cota, cotb, cotc], axis=1) / 4.0
    cot = jnp.where(valid[:, None], cot, 0.0)

    ii = jnp.concatenate([f[:, 1], f[:, 2], f[:, 0]])
    jj = jnp.concatenate([f[:, 2], f[:, 0], f[:, 1]])
    w = jnp.concatenate([cot[:, 0], cot[:, 1], cot[:, 2]])
    w = jnp.where(jnp.concatenate([valid] * 3), w, 0.0)
    rows = jnp.concatenate([ii, jj])
    cols = jnp.concatenate([jj, ii])
    vals = jnp.concatenate([w, w])
    L = jsparse.BCOO((vals, jnp.stack([rows, cols], 1)), shape=(V, V))

    face_area = jnp.where(valid, area, 0.0)
    vert_area = (
        jax.ops.segment_sum(face_area, f[:, 0], num_segments=V)
        + jax.ops.segment_sum(face_area, f[:, 1], num_segments=V)
        + jax.ops.segment_sum(face_area, f[:, 2], num_segments=V)
    )
    inv_areas = jnp.where(vert_area > 0, 1.0 / jnp.clip(vert_area, eps), 0.0)
    return L, inv_areas[:, None]


def norm_laplacian(
    verts: jnp.ndarray, edges: jnp.ndarray, eps: float = 1e-12
) -> jsparse.BCOO:
    """Edge-length-weighted Laplacian: L[i,j] = 1/||vi-vj|| (reference :144)."""
    V = verts.shape[0]
    valid = jnp.all(edges >= 0, axis=-1)
    e0 = jnp.where(valid, edges[:, 0], 0)
    e1 = jnp.where(valid, edges[:, 1], 0)
    d = safe_norm(verts[e0] - verts[e1], axis=1)
    w = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    w = jnp.where(valid, w, 0.0)
    rows = jnp.concatenate([e0, e1])
    cols = jnp.concatenate([e1, e0])
    vals = jnp.concatenate([w, w])
    return jsparse.BCOO((vals, jnp.stack([rows, cols], 1)), shape=(V, V))
