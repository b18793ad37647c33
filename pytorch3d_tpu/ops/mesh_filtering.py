"""Taubin mesh smoothing (reference ops/mesh_filtering.py:25).

lambda/mu alternating norm-Laplacian smoothing; sparse matvecs on XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common.math_utils import safe_norm

import jax


def _norm_weighted_average(verts, edges):
    """One norm-Laplacian averaging step via segment sums (no sparse mat)."""
    V = verts.shape[0]
    valid = jnp.all(edges >= 0, axis=-1)
    e0 = jnp.where(valid, edges[:, 0], 0)
    e1 = jnp.where(valid, edges[:, 1], 0)
    d = safe_norm(verts[e0] - verts[e1], axis=1)
    w = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    w = jnp.where(valid, w, 0.0)
    num = jax.ops.segment_sum(w[:, None] * verts[e1], e0, num_segments=V)
    num = num + jax.ops.segment_sum(w[:, None] * verts[e0], e1, num_segments=V)
    den = jax.ops.segment_sum(w, e0, num_segments=V)
    den = den + jax.ops.segment_sum(w, e1, num_segments=V)
    return num / jnp.clip(den, 1e-10)[:, None]


def taubin_smoothing(meshes, lambd: float = 0.53, mu: float = -0.53, num_iter: int = 10):
    """Taubin smoothing; returns a new Meshes batch."""
    verts = meshes.verts_packed()  # (sum V, 3)
    edges = meshes.edges_packed()
    vmask = meshes.verts_packed_mask()[:, None]

    for _ in range(num_iter):
        for coef in (lambd, mu):
            avg = _norm_weighted_average(verts, edges)
            verts = jnp.where(vmask, (1 - coef) * verts + coef * avg, verts)

    N, V = meshes.verts_padded().shape[:2]
    return meshes.update_padded(verts.reshape(N, V, 3))
