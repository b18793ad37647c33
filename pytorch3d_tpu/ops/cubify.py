"""Voxel grid -> mesh conversion ("cubify").

Parity: reference ops/cubify.py:57 (face-visibility via neighbor occupancy,
corner-lattice vertices, align modes topleft/corner/center, coordinate
normalization cubify.py:219-227).

TPU design: static-capacity everything.  Each voxel contributes up to 12
triangles (6 cube faces x 2), masked by "occupied AND (neighbor empty OR
boundary)"; vertices live on the (D+1)(H+1)(W+1) corner lattice and are
compacted to a prefix-contiguous buffer by a cumsum rank — the reference's
data-dependent nonzero/unique becomes a static scatter, so the whole op
jits and vmaps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..structures.meshes import Meshes

# 12 triangles of a unit cube as corner offsets (dz, dy, dx), outward winding.
_CUBE_TRIS = (
    # -x ("left") face
    (((0, 0, 0), (1, 0, 0), (0, 1, 0)), (0, 0, -1)),
    (((0, 1, 0), (1, 0, 0), (1, 1, 0)), (0, 0, -1)),
    # +y ("bottom") face
    (((0, 1, 0), (1, 1, 1), (0, 1, 1)), (0, 1, 0)),
    (((0, 1, 0), (1, 1, 0), (1, 1, 1)), (0, 1, 0)),
    # -z ("front") face
    (((0, 0, 0), (0, 1, 1), (0, 0, 1)), (-1, 0, 0)),
    (((0, 0, 0), (0, 1, 0), (0, 1, 1)), (-1, 0, 0)),
    # -y ("up") face
    (((0, 0, 0), (1, 0, 1), (1, 0, 0)), (0, -1, 0)),
    (((0, 0, 0), (0, 0, 1), (1, 0, 1)), (0, -1, 0)),
    # +x ("right") face
    (((0, 0, 1), (1, 1, 1), (1, 0, 1)), (0, 0, 1)),
    (((0, 0, 1), (0, 1, 1), (1, 1, 1)), (0, 0, 1)),
    # +z ("back") face
    (((1, 0, 0), (1, 1, 1), (1, 1, 0)), (1, 0, 0)),
    (((1, 0, 0), (1, 0, 1), (1, 1, 1)), (1, 0, 0)),
)


def unravel_index(idx: jnp.ndarray, dims) -> jnp.ndarray:
    """np.unravel_index for dims=(N, H, W, D) (reference cubify.py:18)."""
    if len(dims) != 4:
        raise ValueError("Expects a 4-element list.")
    N, H, W, D = dims
    n = idx // (H * W * D)
    h = (idx - n * H * W * D) // (W * D)
    w = (idx - n * H * W * D - h * W * D) // D
    d = idx - n * H * W * D - h * W * D - w * D
    return jnp.stack((n, h, w, d), axis=1)


def ravel_index(idx: jnp.ndarray, dims) -> jnp.ndarray:
    """Linear index into an array of shape dims=(H, W, D); inverse of
    unravel_index (reference cubify.py:37)."""
    if len(dims) != 3:
        raise ValueError("Expects a 3-element list")
    if idx.shape[1] != 3:
        raise ValueError("Expects an index tensor of shape Nx3")
    H, W, D = dims
    return idx[:, 0] * W * D + idx[:, 1] * D + idx[:, 2]


def _cubify_one(vox: jnp.ndarray, thresh: float, align: str):
    """vox (D, H, W) -> (verts (VCAP, 3), faces (FCAP, 3), n_verts, n_faces)."""
    D, H, W = vox.shape
    occ = vox > thresh
    CD, CH, CW = D + 1, H + 1, W + 1
    NC = CD * CH * CW

    zz, yy, xx = jnp.meshgrid(
        jnp.arange(D), jnp.arange(H), jnp.arange(W), indexing="ij"
    )

    def corner_id(z, y, x):
        return (z * CH + y) * CW + x

    tri_faces = []
    tri_valid = []
    for tri, (dz, dy, dx) in _CUBE_TRIS:
        nz, ny, nx = zz + dz, yy + dy, xx + dx
        inb = (nz >= 0) & (nz < D) & (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
        nocc = (
            occ[jnp.clip(nz, 0, D - 1), jnp.clip(ny, 0, H - 1),
                jnp.clip(nx, 0, W - 1)]
            & inb
        )
        exposed = occ & ~nocc
        ids = jnp.stack(
            [corner_id(zz + c[0], yy + c[1], xx + c[2]) for c in tri], axis=-1
        )
        tri_faces.append(ids)
        tri_valid.append(exposed)

    faces_all = jnp.stack(tri_faces, axis=3).reshape(-1, 3)  # (DHW*12, 3)
    valid_all = jnp.stack(tri_valid, axis=3).reshape(-1)

    # mark used corners (drop invalid faces' scatter entirely)
    dest_corners = jnp.where(
        valid_all[:, None], faces_all, NC
    ).reshape(-1)
    used = jnp.zeros((NC,), bool).at[dest_corners].set(True, mode="drop")
    ranks = jnp.cumsum(used) - 1
    n_verts = jnp.sum(used).astype(jnp.int32)

    # corner coordinates (reference normalization, cubify.py:219-227)
    cz, cy, cx = jnp.meshgrid(
        jnp.arange(CD, dtype=jnp.float32),
        jnp.arange(CH, dtype=jnp.float32),
        jnp.arange(CW, dtype=jnp.float32),
        indexing="ij",
    )
    if align == "center":
        cx, cy, cz = cx - 0.5, cy - 0.5, cz - 0.5
    margin = 0.0 if align == "corner" else 1.0
    xs = cx * 2.0 / (W - margin) - 1.0
    ys = cy * 2.0 / (H - margin) - 1.0
    zs = cz * 2.0 / (D - margin) - 1.0
    coords = jnp.stack([xs, ys, zs], axis=-1).reshape(NC, 3)

    verts_out = jnp.zeros((NC, 3), jnp.float32)
    verts_out = verts_out.at[jnp.where(used, ranks, NC)].set(coords, mode="drop")

    FCAP = faces_all.shape[0]
    faces_remap = ranks[faces_all].astype(jnp.int32)
    franks = jnp.cumsum(valid_all) - 1
    n_faces = jnp.sum(valid_all).astype(jnp.int32)
    faces_out = jnp.full((FCAP, 3), -1, jnp.int32)
    faces_out = faces_out.at[jnp.where(valid_all, franks, FCAP)].set(
        faces_remap, mode="drop"
    )
    # source voxel (flat z*H*W + y*W + x) per compacted output face, for feats
    src_vox = jnp.arange(FCAP, dtype=jnp.int32) // 12
    vox_out = jnp.full((FCAP,), -1, jnp.int32)
    vox_out = vox_out.at[jnp.where(valid_all, franks, FCAP)].set(
        src_vox, mode="drop"
    )
    return verts_out, faces_out, n_verts, n_faces, vox_out


def cubify(
    voxels: jnp.ndarray,  # (N, D, H, W)
    thresh: float,
    feats: Optional[jnp.ndarray] = None,
    device=None,
    align: str = "topleft",
) -> Meshes:
    """Threshold a voxel batch into a Meshes batch (reference ops/cubify.py:57)."""
    if align not in ("topleft", "corner", "center"):
        raise ValueError("Align mode must be one of (topleft, corner, center).")
    if voxels.ndim != 4:
        raise ValueError("voxels must be (N, D, H, W)")
    fn = lambda v: _cubify_one(v, thresh, align)
    verts, faces, nv, nf, vox_ids = jax.vmap(fn)(voxels)
    textures = None
    if feats is not None and align == "center":
        # one color per face: the generating voxel's feature vector, as a
        # 1x1 TexturesAtlas (reference cubify.py:258-270)
        if feats.ndim != 5:
            raise ValueError("feats must be (N, K, D, H, W)")
        N, K = feats.shape[:2]
        feats_flat = jnp.moveaxis(feats, 1, -1).reshape(N, -1, K)  # (N, DHW, K)
        atlas = jax.vmap(lambda f, v: f[jnp.maximum(v, 0)])(
            feats_flat, vox_ids
        )  # (N, FCAP, K)
        atlas = jnp.where(vox_ids[..., None] >= 0, atlas, 0.0)
        from ..renderer.mesh.textures import TexturesAtlas

        textures = TexturesAtlas.create(atlas[:, :, None, None, :])
    return Meshes.create(
        verts,
        faces,
        num_verts_per_mesh=nv,
        num_faces_per_mesh=nf,
        textures=textures,
    )
