"""Loop-style 1->4 mesh subdivision.

Parity: reference ops/subdivide_meshes.py:15 (`SubdivideMeshes`).

TPU design: each mesh is processed with static capacities — new-vertex
buffer V + 3F (edge midpoints; unique edges <= 3F), new-face buffer 4F —
and per-mesh counts, preserving the padded-first prefix-contiguous
invariant, then vmapped over the batch.  The reference's precomputed-
homogeneous fast path is unnecessary: XLA compiles one program for the
whole batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..structures.meshes import Meshes


def _subdivide_one(
    verts: jnp.ndarray,  # (V, 3)
    faces: jnp.ndarray,  # (F, 3) local ids, -1 padded
    nv: jnp.ndarray,  # () int32
    nf: jnp.ndarray,  # () int32
    feats: Optional[jnp.ndarray],  # (V, D) or None
):
    V = verts.shape[0]
    F = faces.shape[0]
    valid = jnp.all(faces >= 0, axis=-1)

    # --- local unique edges by sort-dedup (same scheme as Meshes._compute_edges)
    e12 = faces[:, 1:3]
    e02 = faces[:, 0:3:2]
    e01 = faces[:, 0:2]
    edges_all = jnp.concatenate([e12, e02, e01], axis=0)  # (3F, 2)
    valid_all = jnp.tile(valid, 3)
    a = jnp.where(valid_all, jnp.minimum(edges_all[:, 0], edges_all[:, 1]), V)
    b = jnp.where(valid_all, jnp.maximum(edges_all[:, 0], edges_all[:, 1]), V)
    order = jnp.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    )
    uniq = first & (a_s < V)
    ranks = jnp.cumsum(uniq) - 1
    n_edges = jnp.sum(uniq).astype(jnp.int32)

    # inverse: (face, slot) -> local edge rank
    inverse = jnp.zeros((3 * F,), jnp.int32).at[order].set(ranks.astype(jnp.int32))
    f2e = jnp.stack([inverse[0:F], inverse[F : 2 * F], inverse[2 * F :]], axis=1)

    # --- midpoints: edge rank r gets vertex id nv + r
    E_cap = 3 * F
    mid_src = jnp.zeros((E_cap, 2), jnp.int32).at[
        jnp.where(uniq, ranks, E_cap)
    ].set(jnp.stack([a_s, b_s], -1), mode="drop")
    mids = 0.5 * (
        verts[jnp.clip(mid_src[:, 0], 0, V - 1)]
        + verts[jnp.clip(mid_src[:, 1], 0, V - 1)]
    )

    new_verts = jnp.zeros((V + E_cap, 3), verts.dtype)
    new_verts = new_verts.at[jnp.arange(V)].set(verts)
    erank = jnp.arange(E_cap, dtype=jnp.int32)
    dest = jnp.where(erank < n_edges, nv + erank, V + E_cap)
    new_verts = new_verts.at[dest].set(mids, mode="drop")

    new_feats = None
    if feats is not None:
        D = feats.shape[-1]
        fm = 0.5 * (
            feats[jnp.clip(mid_src[:, 0], 0, V - 1)]
            + feats[jnp.clip(mid_src[:, 1], 0, V - 1)]
        )
        new_feats = jnp.zeros((V + E_cap, D), feats.dtype)
        new_feats = new_feats.at[jnp.arange(V)].set(feats)
        new_feats = new_feats.at[dest].set(fm, mode="drop")

    # --- new faces
    m = nv + f2e  # (F, 3) midpoint ids; column k = edge opposite vertex k
    v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
    m0, m1, m2 = m[:, 0], m[:, 1], m[:, 2]
    f0 = jnp.stack([v0, m2, m1], axis=1)
    f1 = jnp.stack([v1, m0, m2], axis=1)
    f2 = jnp.stack([v2, m1, m0], axis=1)
    f3 = jnp.stack([m0, m1, m2], axis=1)
    # interleave per source face (groups of 4) so valid faces stay prefixed
    new_faces = jnp.stack([f0, f1, f2, f3], axis=1).reshape(4 * F, 3)
    new_valid = jnp.repeat(valid, 4)
    # compact to a prefix: position = 4 * face_idx works already iff valid
    # faces are a prefix of `faces` (the Meshes invariant) — they are.
    new_faces = jnp.where(new_valid[:, None], new_faces, -1)

    return new_verts, new_faces, nv + n_edges, 4 * nf, new_feats


class SubdivideMeshes:
    """Subdivide each face into 4 (reference ops/subdivide_meshes.py:15)."""

    def __init__(self, meshes: Optional[Meshes] = None) -> None:
        # The reference precomputes topology for homogeneous batches; under
        # XLA the computation is compiled once regardless, so nothing to do.
        self._precomputed = meshes

    def __call__(
        self, meshes: Meshes, feats: Optional[jnp.ndarray] = None
    ):
        """Returns (new Meshes [, new packed feats (sum V', D)])."""
        verts = meshes.verts_padded()
        faces = meshes.faces_padded()
        nv = meshes.num_verts_per_mesh()
        nf = meshes.num_faces_per_mesh()
        N, V, _ = verts.shape

        feats_padded = None
        if feats is not None:
            D = feats.shape[-1]
            feats_padded = feats.reshape(N, V, D)

        if feats is None:
            fn = lambda v, f, a, b: _subdivide_one(v, f, a, b, None)[:4]
            nverts, nfaces, nnv, nnf = jax.vmap(fn)(verts, faces, nv, nf)
            new_feats = None
        else:
            fn = lambda v, f, a, b, ft: _subdivide_one(v, f, a, b, ft)
            nverts, nfaces, nnv, nnf, new_feats = jax.vmap(fn)(
                verts, faces, nv, nf, feats_padded
            )

        new = Meshes.create(
            nverts, nfaces, num_verts_per_mesh=nnv, num_faces_per_mesh=nnf
        )
        if feats is not None:
            return new, new_feats.reshape(-1, feats.shape[-1])
        return new
