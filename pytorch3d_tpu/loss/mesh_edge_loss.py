"""Edge length regularizer (reference loss/mesh_edge_loss.py:12)."""

from __future__ import annotations

import jax.numpy as jnp

from ..common.math_utils import safe_norm


def mesh_edge_loss(meshes, target_length: float = 0.0) -> jnp.ndarray:
    """Mean (per mesh, then over batch) of (||e|| - target)^2."""
    if meshes.isempty():
        return jnp.asarray(0.0, jnp.float32)
    N = len(meshes)
    edges = meshes.edges_packed()  # (E, 2), -1 padded
    verts = meshes.verts_packed()
    emask = meshes.edges_packed_mask()
    edge_to_mesh = meshes.edges_packed_to_mesh_idx()
    num_edges = meshes.num_edges_per_mesh().astype(jnp.float32)  # (N,)

    w = jnp.where(
        emask, 1.0 / jnp.clip(num_edges[jnp.maximum(edge_to_mesh, 0)], 1.0), 0.0
    )
    e = jnp.maximum(edges, 0)
    length = safe_norm(verts[e[:, 1]] - verts[e[:, 0]], axis=1)
    loss = (length - target_length) ** 2 * w
    return jnp.sum(loss) / N
