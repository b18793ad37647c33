"""Marching cubes isosurface extraction, TPU-native.

Parity: reference ops/marching_cubes.py:255 (`marching_cubes`), :135
(`marching_cubes_naive`) + csrc/marching_cubes/ (1,178 LoC, 2-pass
classify->scan->generate, marching_cubes.cu:16-37).

TPU design: the CUDA 2-pass structure becomes a fully vectorized
static-capacity pipeline — per-cell cube indices (table lookup), per-edge
vertex interpolation, vertex dedup by *canonical global edge id*
(axis * NV + min_endpoint) via sort + cumsum ranks, and prefix compaction —
i.e. the same classify/scan/generate but with XLA sort replacing the CUDA
stream-compaction.  Non-differentiable (as in the reference).

Conventions match the reference Cube class (marching_cubes.py:20-134):
local vertex v has offsets (dx, dy, dz) = (v&1, v>>1&1, v>>2&1); cube index
bit i set when vol[corner INDEX[i]] < isolevel; output verts in (x, y, z).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .marching_cubes_data import EDGE_TO_VERTICES, INDEX, NUM_TRIS, TRI_TABLE

_EPS = 1e-5


def _mc_one(vol: jnp.ndarray, isolevel, eps=_EPS):
    """vol (D, H, W) -> (verts (VCAP, 3), faces (FCAP, 3), nv, nf)."""
    D, H, W = vol.shape
    NV = D * H * W

    # local vertex offsets (dx, dy, dz) for v in 0..7 (bit coding)
    off = np.asarray(
        [[v & 1, (v >> 1) & 1, (v >> 2) & 1] for v in range(8)], np.int32
    )
    tri_table = jnp.asarray(TRI_TABLE)  # (256, 5, 3)
    e2v = jnp.asarray(EDGE_TO_VERTICES)  # (12, 2)
    index = jnp.asarray(INDEX)  # (8,)

    zz, yy, xx = jnp.meshgrid(
        jnp.arange(D - 1), jnp.arange(H - 1), jnp.arange(W - 1), indexing="ij"
    )
    cx = xx.reshape(-1)
    cy = yy.reshape(-1)
    cz = zz.reshape(-1)
    NCELL = cx.shape[0]

    # corner values for bit-coded vertex v: vol[z+dz, y+dy, x+dx]
    corner_vals = jnp.stack(
        [
            vol[cz + int(off[v, 2]), cy + int(off[v, 1]), cx + int(off[v, 0])]
            for v in range(8)
        ],
        axis=-1,
    )  # (NCELL, 8)

    # cube index: bit i set when value at corner INDEX[i] < isolevel
    bits = (corner_vals[:, index] < isolevel).astype(jnp.int32)
    cube_index = jnp.sum(bits * (2 ** jnp.arange(8, dtype=jnp.int32)), axis=-1)

    tris = tri_table[cube_index]  # (NCELL, 5, 3) edge ids, -1 pad
    tri_ok = tris[..., 0] >= 0  # (NCELL, 5)

    # interpolated position + canonical global edge id for every (cell, edge
    # slot) entry
    edges = jnp.maximum(tris, 0)  # (NCELL, 5, 3)
    v1 = e2v[edges][..., 0]  # (NCELL, 5, 3) local vert id
    v2 = e2v[edges][..., 1]
    off_j = jnp.asarray(off)  # (8, 3) (dx, dy, dz)

    def vert_pos_val(vloc):
        px = cx[:, None, None] + off_j[vloc][..., 0]
        py = cy[:, None, None] + off_j[vloc][..., 1]
        pz = cz[:, None, None] + off_j[vloc][..., 2]
        val = vol[pz, py, px]
        gid = px + py * W + pz * W * H
        return jnp.stack([px, py, pz], -1).astype(vol.dtype), val, gid

    p1, val1, gid1 = vert_pos_val(v1)
    p2, val2, gid2 = vert_pos_val(v2)

    # linear interpolation with endpoint snapping (reference vert_interp)
    denom = val2 - val1
    mu = (isolevel - val1) / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
    point = p1 + mu[..., None] * (p2 - p1)
    snap1 = jnp.abs(isolevel - val1) < eps
    snap2 = jnp.abs(isolevel - val2) < eps
    degen = jnp.abs(denom) < eps
    point = jnp.where((snap1 | (degen & ~snap2))[..., None], p1, point)
    point = jnp.where((snap2 & ~snap1)[..., None], p2, point)

    # canonical edge id: differing axis * NV + min endpoint gid.  When the
    # interp snapped to an endpoint, the dedup key is that endpoint itself
    # (axis 3), so coincident snapped vertices merge (reference merges them
    # through identical positions in its dict).
    gmin = jnp.minimum(gid1, gid2)
    dgid = jnp.abs(gid2 - gid1)
    axis = jnp.where(dgid == 1, 0, jnp.where(dgid == W, 1, 2))
    key = axis * NV + gmin
    key = jnp.where(snap1, 3 * NV + gid1, key)
    key = jnp.where(snap2 & ~snap1, 3 * NV + gid2, key)

    # degenerate-triangle mask: all 3 points pairwise distinct
    k0, k1, k2 = key[..., 0], key[..., 1], key[..., 2]
    distinct = (k0 != k1) & (k1 != k2) & (k2 != k0)
    tri_ok = tri_ok & distinct

    # ---- dedup vertices over all (cell, tri, corner) entries
    M = NCELL * 5 * 3
    keys_flat = jnp.where(tri_ok[..., None], key, jnp.iinfo(jnp.int32).max).reshape(M)
    pts_flat = point.reshape(M, 3)
    order = jnp.argsort(keys_flat)
    ks = keys_flat[order]
    sentinel = jnp.iinfo(jnp.int32).max
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    uniq = first & (ks != sentinel)
    ranks_sorted = jnp.cumsum(uniq) - 1
    n_verts = jnp.sum(uniq).astype(jnp.int32)

    # vertex positions: scatter sorted-unique points into prefix
    VCAP = M
    verts_out = jnp.zeros((VCAP, 3), vol.dtype)
    vdest = jnp.where(uniq, ranks_sorted, VCAP)
    verts_out = verts_out.at[vdest].set(pts_flat[order], mode="drop")

    # per-entry vertex index (inverse permutation)
    entry_rank = jnp.zeros((M,), jnp.int32).at[order].set(
        ranks_sorted.astype(jnp.int32)
    )
    faces_entries = entry_rank.reshape(NCELL, 5, 3)

    # ---- compact valid triangles
    FCAP = NCELL * 5
    fvalid = tri_ok.reshape(FCAP)
    franks = jnp.cumsum(fvalid) - 1
    n_faces = jnp.sum(fvalid).astype(jnp.int32)
    faces_out = jnp.full((FCAP, 3), -1, jnp.int32)
    fdest = jnp.where(fvalid, franks, FCAP)
    faces_out = faces_out.at[fdest].set(
        faces_entries.reshape(FCAP, 3), mode="drop"
    )
    return verts_out, faces_out, n_verts, n_faces


def marching_cubes(
    vol_batch: jnp.ndarray,  # (N, D, H, W)
    isolevel: Optional[float] = None,
    return_local_coords: bool = True,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Extract isosurfaces (reference ops/marching_cubes.py:255).

    Returns ([verts_i (Vi, 3)], [faces_i (Fi, 3)]) per volume; verts in
    local [-1, 1]^3 when `return_local_coords` (reference convention) else
    grid coords (x in [0, W-1], ...).
    """
    N, D, H, W = vol_batch.shape
    batched_verts, batched_faces = [], []
    for n in range(N):
        vol = vol_batch[n]
        iso = (
            float((vol.max() + vol.min()) / 2.0)
            if isolevel is None
            else isolevel
        )
        verts, faces, nv, nf = _mc_one(vol, iso)
        nv, nf = int(nv), int(nf)
        verts = verts[:nv]
        faces = faces[:nf]
        if return_local_coords and nv > 0:
            scale = jnp.asarray([W - 1, H - 1, D - 1], vol.dtype) * 0.5
            verts = verts / scale - 1.0
        batched_verts.append(verts)
        batched_faces.append(faces)
    return batched_verts, batched_faces


def marching_cubes_naive(vol_batch, isolevel=None, return_local_coords=True):
    """Reference-naming alias; same vectorized implementation."""
    return marching_cubes(vol_batch, isolevel, return_local_coords)
