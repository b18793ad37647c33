"""R2N2 utilities: binvox reading, voxel alignment, Blender camera,
collation.

Parity: reference datasets/r2n2/utils.py (`read_binvox_coords` :158,
`voxelize`-style alignment :353, `BlenderCamera` :449,
`collate_batched_R2N2` :43, `compute_extrinsic_matrix` :96).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ...renderer.cameras import CamerasBase
from ...structures.meshes import Meshes, join_meshes_as_batch


def read_binvox_header(f):
    line = f.readline().strip()
    if not line.startswith(b"#binvox"):
        raise ValueError("Not a binvox file")
    dims = translate = scale = None
    while True:
        line = f.readline().strip()
        if line.startswith(b"dim"):
            dims = [int(x) for x in line.split()[1:]]
        elif line.startswith(b"translate"):
            translate = [float(x) for x in line.split()[1:]]
        elif line.startswith(b"scale"):
            scale = float(line.split()[1])
        elif line.startswith(b"data"):
            break
        elif not line:
            raise ValueError("Premature EOF in binvox header")
    return dims, translate, scale


def read_binvox_coords(f, dtype=jnp.float32):
    """Read a .binvox file -> (P, 3) coordinates of occupied voxels
    (reference r2n2/utils.py:158)."""
    dims, translate, scale = read_binvox_header(f)
    D = dims[0]
    data = np.frombuffer(f.read(), dtype=np.uint8)
    vals = data[0::2]
    counts = data[1::2].astype(np.int64)
    idxs = np.repeat(vals, counts).astype(bool)
    grid = idxs.reshape(dims)  # x-major binvox layout: (x, z, y)
    x, z, y = np.nonzero(grid)
    coords = np.stack([x, y, z], axis=1).astype(np.float32)
    return jnp.asarray(coords, dtype)


def compute_extrinsic_matrix(azimuth, elevation, distance):
    """Blender-style RT matrix (reference r2n2/utils.py:96)."""
    az = np.radians(azimuth)
    el = np.radians(elevation)
    # rotation about y (azimuth) then x (elevation)
    Raz = np.asarray(
        [
            [np.cos(az), 0, -np.sin(az)],
            [0, 1, 0],
            [np.sin(az), 0, np.cos(az)],
        ],
        np.float32,
    )
    Rel = np.asarray(
        [
            [1, 0, 0],
            [0, np.cos(el), -np.sin(el)],
            [0, np.sin(el), np.cos(el)],
        ],
        np.float32,
    )
    R = Rel @ Raz
    RT = np.eye(4, dtype=np.float32)
    RT[:3, :3] = R
    RT[2, 3] = distance
    return jnp.asarray(RT)


from flax import struct  # noqa: E402


@struct.dataclass
class BlenderCamera(CamerasBase):
    """Camera from R2N2's Blender renders (reference :449)."""

    R: jnp.ndarray
    T: jnp.ndarray
    K: jnp.ndarray = None

    @classmethod
    def create(cls, R=None, T=None, K=None):
        R = jnp.asarray(R, jnp.float32) if R is not None else jnp.eye(3)[None]
        T = jnp.asarray(T, jnp.float32) if T is not None else jnp.zeros((1, 3))
        if K is None:
            K = jnp.broadcast_to(jnp.eye(4)[None], (R.shape[0], 4, 4))
        return cls(R=R, T=T, K=jnp.asarray(K, jnp.float32))

    def get_projection_transform(self, **kwargs):
        from ...transforms.transform3d import Transform3d

        return Transform3d(matrix=jnp.swapaxes(self.K, -1, -2))

    def is_perspective(self) -> bool:
        return False

    def in_ndc(self) -> bool:
        return True


def collate_batched_R2N2(batch: List[Dict]) -> Dict:
    """Collate R2N2 items: meshes + stacked images/calibs (reference :43)."""
    collated = {}
    for k in batch[0].keys():
        collated[k] = [d[k] for d in batch]
    if {"verts", "faces"}.issubset(collated.keys()):
        collated["mesh"] = join_meshes_as_batch(
            [
                Meshes.create([v], [f])
                for v, f in zip(collated["verts"], collated["faces"])
            ]
        )
    for k in ("images", "R", "T", "K", "voxels"):
        if k in collated and collated[k][0] is not None:
            collated[k] = jnp.stack(
                [jnp.asarray(x) for x in collated[k]]
            )
    return collated

SHAPENET_MIN_ZMIN = 0.67
SHAPENET_MAX_ZMAX = 0.92
CUBIFY_THRESH = 0.2


def project_verts(verts, P, eps: float = 1e-1):
    """Project (V, 3) or (N, V, 3) vertices by 4x4 matrices with sign-safe
    w clamping (reference r2n2/utils.py:401 `project_verts`)."""
    verts = jnp.asarray(verts, jnp.float32)
    P = jnp.asarray(P, jnp.float32)
    singleton = verts.ndim == 2
    if singleton:
        verts, P = verts[None], P[None]
    ones = jnp.ones(verts.shape[:2] + (1,), verts.dtype)
    hom = jnp.concatenate([verts, ones], axis=2)
    cam = jnp.einsum("nvj,nkj->nvk", hom, P)
    w = cam[:, :, 3:]
    w_sign = jnp.where(w == 0, 1.0, jnp.sign(w))
    w = w_sign * jnp.maximum(jnp.abs(w), eps)
    out = cam[:, :, :3] / w
    return out[0] if singleton else out


def voxelize(voxel_coords, P, V: int):
    """(V_pts, 3) voxel coords + 4x4 projection -> (V, V, V) occupancy grid
    aligned with the R2N2 renders (reference r2n2/utils.py:353: project,
    renormalize z by the dataset-wide [SHAPENET_MIN_ZMIN, SHAPENET_MAX_ZMAX]
    range, flip x, round to the grid).  TPU-idiomatic scatter via a
    one-hot-free `.at[].set` on the flat grid."""
    coords = project_verts(jnp.asarray(voxel_coords, jnp.float32), P)
    m = 2.0 / (SHAPENET_MAX_ZMAX - SHAPENET_MIN_ZMIN)
    b = -2.0 * SHAPENET_MIN_ZMIN / (SHAPENET_MAX_ZMAX - SHAPENET_MIN_ZMIN) - 1.0
    coords = coords.at[:, 2].set(coords[:, 2] * m + b)
    coords = coords.at[:, 0].set(-coords[:, 0])  # flip x

    # [-1, 1]^3 -> [0, V-1]^3 grid indices
    idx = jnp.round(0.5 * (V - 1) * (coords + 1.0)).astype(jnp.int32)
    valid = jnp.all((idx >= 0) & (idx < V), axis=1)
    x, y, z = idx[:, 0], idx[:, 1], idx[:, 2]
    flat = jnp.where(valid, (z * V + y) * V + x, V * V * V)
    voxels = jnp.zeros((V * V * V + 1,), jnp.uint8).at[flat].set(1)
    return voxels[:-1].reshape(V, V, V)


def render_cubified_voxels(voxels, shader_type=None, **kwargs):
    """Cubify (N, D, D, D) voxel grids at CUBIFY_THRESH and render them with
    a BlenderCamera (reference r2n2/utils.py:481)."""
    from ...ops.cubify import cubify
    from ...renderer import (
        MeshRasterizer,
        MeshRenderer,
        PointLights,
        RasterizationSettings,
    )
    from ...renderer.mesh.shader import HardPhongShader
    from ...renderer.mesh.textures import TexturesVertex

    if shader_type is None:
        shader_type = HardPhongShader
    meshes = cubify(jnp.asarray(voxels, jnp.float32), CUBIFY_THRESH)
    meshes = meshes.replace(
        textures=TexturesVertex.create(jnp.ones_like(meshes.verts_padded()))
    )
    cameras = kwargs.get("cameras") or BlenderCamera.create(
        R=jnp.broadcast_to(jnp.eye(3)[None], (len(meshes), 3, 3)),
        T=jnp.zeros((len(meshes), 3)),
    )
    renderer = MeshRenderer(
        rasterizer=MeshRasterizer(
            cameras,
            kwargs.get("raster_settings", RasterizationSettings()),
        ),
        shader=shader_type(
            cameras=cameras,
            lights=kwargs.get("lights", PointLights.create()),
        ),
    )
    return renderer(meshes)



def align_bbox(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """Scale+shift src points per-axis so their min/max align with tgt's
    (reference r2n2/utils.py:323)."""
    if src.ndim != 2 or tgt.ndim != 2:
        raise ValueError("Both src and tgt need to have dimensions of 2.")
    if src.shape[-1] != 3 or tgt.shape[-1] != 3:
        raise ValueError(
            "Both src and tgt need to have sizes of 3 along the second "
            "dimension."
        )
    src_min = src.min(axis=0)
    src_max = src.max(axis=0)
    tgt_min = tgt.min(axis=0)
    tgt_max = tgt.max(axis=0)
    scale = (tgt_max - tgt_min) / (src_max - src_min)
    shift = tgt_min - scale * src_min
    return scale * src + shift
