"""Normal consistency across shared mesh edges.

Parity: reference loss/mesh_normal_consistency.py:13 +
csrc/mesh_normal_consistency/ (vertex-pair enumeration, 83 LoC C++).

TPU design: the C++ enumeration of faces sharing an edge becomes a static
sort: all 3F (edge_id, face_id) incidences are sorted by edge id and
consecutive entries with equal ids form pairs.  For manifold meshes (<= 2
faces/edge — the common case and what the loss is defined for) this is
exactly the reference pairing; for non-manifold edges with k > 2 faces we
score the k-1 consecutive pairs instead of all k(k-1)/2 combinations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common.math_utils import safe_normalize


def mesh_normal_consistency(meshes) -> jnp.ndarray:
    if meshes.isempty():
        return jnp.asarray(0.0, jnp.float32)
    N = len(meshes)
    verts = meshes.verts_packed()  # (V, 3)
    faces = meshes.faces_packed()  # (F, 3), -1 padded
    face_to_edge = meshes.faces_packed_to_edges_packed()  # (F, 3)
    edges = meshes.edges_packed()  # (E, 2)
    face_to_mesh = meshes.faces_packed_to_mesh_idx()  # (F,)
    F = faces.shape[0]
    fvalid = jnp.all(faces >= 0, axis=-1)

    # (3F,) incidence lists
    edge_ids = jnp.where(fvalid[:, None], face_to_edge, 3 * F + 1).reshape(-1)
    face_ids = jnp.tile(jnp.arange(F, dtype=jnp.int32)[:, None], (1, 3)).reshape(-1)

    order = jnp.argsort(edge_ids)
    es = edge_ids[order]
    fs = face_ids[order]

    # consecutive equal edge ids -> a face pair over that edge
    pair_ok = (es[:-1] == es[1:]) & (es[:-1] <= 3 * F)
    e_pair = jnp.where(pair_ok, es[:-1], 0)
    fA = jnp.where(pair_ok, fs[:-1], 0)
    fB = jnp.where(pair_ok, fs[1:], 0)

    v0 = verts[jnp.maximum(edges[e_pair][:, 0], 0)]
    v1 = verts[jnp.maximum(edges[e_pair][:, 1], 0)]
    fsum = jnp.sum(jnp.maximum(faces, 0), axis=-1)
    e_vsum = (
        jnp.maximum(edges[e_pair][:, 0], 0) + jnp.maximum(edges[e_pair][:, 1], 0)
    )
    va = verts[jnp.maximum(fsum[fA] - e_vsum, 0)]  # opposite vert in face A
    vb = verts[jnp.maximum(fsum[fB] - e_vsum, 0)]

    n0 = jnp.cross(v1 - v0, va - v0)
    n1 = -jnp.cross(v1 - v0, vb - v0)
    cos = jnp.sum(_normalize(n0) * _normalize(n1), axis=-1)
    loss = jnp.where(pair_ok, 1.0 - cos, 0.0)

    # per-mesh averaging then batch mean (reference weighting)
    pair_mesh = jnp.where(pair_ok, face_to_mesh[fA], N)  # sentinel bin N
    pairs_per_mesh = jax.ops.segment_sum(
        pair_ok.astype(jnp.float32), pair_mesh, num_segments=N + 1
    )[:N]
    w = jnp.where(
        pair_ok,
        1.0
        / jnp.clip(pairs_per_mesh[jnp.clip(pair_mesh, 0, N - 1)], 1.0),
        0.0,
    )
    return jnp.sum(loss * w) / N


def _normalize(v, eps=1e-12):
    return safe_normalize(v)
