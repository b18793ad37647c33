"""Pixel-sharded rasterization with `shard_map` and explicit collectives.

SURVEY §2.12: the reference scales rasterization with one CUDA device per
image (DDP over the batch, experiment.py:206-212).  The TPU-native design
shards the PIXEL ROWS of a single image over the mesh's ray/tile axis:

- the face list is small and REPLICATED (in_spec `P()`),
- each device rasterizes its own row band against all faces (per-pixel
  top-K selection is embarrassingly parallel across pixels, so the
  sharded result is exactly the unsharded one),
- the fragment quantities are recomputed differentiably per band, and
  `shard_map`'s AD inserts the `psum` that reduces the replicated
  face-vertex gradient across devices (the collective the CUDA path
  never needed, riding ICI here).

`rasterize_fragments_shard_map` returns the same (pix_to_face, zbuf,
bary, dists) as `rasterize_meshes` for a single (F, 3, 3) face tensor.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..renderer.mesh.rasterize_meshes import (
    _fragments_from_gathered,
    pixel_grid_ndc,
    rasterize_topk_xla_at_pixels,
)
from ..renderer.mesh.rasterize_pallas import (
    _tile_for,
    _tile_for_k,
    rasterize_fragments_pallas_band,
    required_faces_per_tile,
)


def rasterize_fragments_shard_map(
    face_verts: jnp.ndarray,  # (F, 3, 3) NDC xy + view z
    valid: jnp.ndarray,  # (F,)
    image_size: Tuple[int, int],
    mesh: Mesh,
    axis: str = "rays",
    blur_radius: float = 0.0,
    faces_per_pixel: int = 1,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    chunk_size: int = 256,
    backend: str = "auto",
    max_faces_per_tile: Optional[int] = None,
):
    """Row-band sharded rasterization (differentiable wrt face_verts).

    The image's H rows are sharded over `mesh` axis `axis`; faces are
    replicated.  pix_to_face is non-differentiable; zbuf/bary/dists carry
    gradients to face_verts with an automatic cross-band psum.

    `backend`: "pallas" drives the PRODUCTION Pallas kernel per band
    (each device rasterizes its tile rows via
    `rasterize_fragments_pallas_band`, bit-identical to the matching rows
    of the unsharded kernel); "xla" uses the jnp oracle; "auto" picks
    pallas on TPU meshes.
    """
    H, W = image_size
    n = mesh.shape[axis]
    if H % n != 0:
        raise ValueError(
            f"image height {H} must divide the '{axis}' axis size {n}"
        )
    if backend == "auto":
        backend = (
            "pallas"
            if all(d.platform == "tpu" for d in mesh.devices.flat)
            else "xla"
        )
    if backend == "pallas":
        return _rasterize_shard_map_pallas(
            face_verts, valid, image_size, mesh, axis, blur_radius,
            faces_per_pixel, perspective_correct, clip_barycentric_coords,
            cull_backfaces, max_faces_per_tile,
        )
    yf, xf = pixel_grid_ndc(H, W, face_verts.dtype)
    pxy = jnp.stack(jnp.meshgrid(yf, xf, indexing="ij")[::-1], axis=-1)

    def band(pxy_local, fv, ok):
        idx = rasterize_topk_xla_at_pixels(
            jax.lax.stop_gradient(fv), ok, pxy_local, blur_radius,
            faces_per_pixel, perspective_correct, clip_barycentric_coords,
            cull_backfaces, chunk_size,
        )
        sel = jnp.maximum(idx, 0)
        gathered = fv[sel]  # (h, W, K, 3, 3) — differentiable gather
        zbuf, bary, dists = _fragments_from_gathered(
            gathered, idx, image_size, perspective_correct,
            clip_barycentric_coords, pxy=pxy_local,
        )
        return idx, zbuf, bary, dists

    spec_px = P(axis)
    return shard_map(
        band,
        mesh=mesh,
        in_specs=(spec_px, P(), P()),
        out_specs=(spec_px, spec_px, spec_px, spec_px),
        check_rep=False,
    )(pxy, face_verts, valid)


def sharded_silhouette_loss_and_grad(
    face_verts: jnp.ndarray,
    valid: jnp.ndarray,
    image_size: Tuple[int, int],
    mesh: Mesh,
    axis: str = "rays",
    blur_radius: float = 1e-4,
    faces_per_pixel: int = 8,
    sigma: float = 1e-4,
):
    """Convenience: soft-silhouette loss + face-vert gradient through the
    sharded rasterizer (used by the scaling harness and dryrun)."""

    def loss(fv):
        _, _, _, dists = rasterize_fragments_shard_map(
            fv, valid, image_size, mesh, axis, blur_radius,
            faces_per_pixel,
        )
        alpha = 1.0 - jnp.prod(
            1.0 - jax.nn.sigmoid(-dists / sigma), axis=-1
        )
        return jnp.mean(alpha)

    return jax.value_and_grad(loss)(face_verts)


def _rasterize_shard_map_pallas(
    face_verts, valid, image_size, mesh, axis, blur_radius,
    faces_per_pixel, perspective_correct, clip_barycentric_coords,
    cull_backfaces, max_faces_per_tile,
):
    """shard_map over the production Pallas kernel: each device rasterizes
    its own band of tile rows (ty0 = axis_index * rows-per-band) against
    the replicated face list; `shard_map` AD inserts the psum that reduces
    the face-vertex gradient across bands."""
    H, W = image_size
    n = mesh.shape[axis]
    TH, _ = _tile_for(
        faces_per_pixel, face_verts.shape[0], H
    )
    if (H // n) % TH != 0:
        raise ValueError(
            f"band height {H // n} must be a multiple of the K-aware tile"
            f" height {TH} (K={faces_per_pixel})"
        )
    n_ty_band = (H // n) // TH

    mft = max_faces_per_tile
    if mft is None and not isinstance(face_verts, jax.core.Tracer):
        # exact capacity, same policy as the unsharded eager entry
        need = required_faces_per_tile(
            face_verts, valid, (H, W), blur_radius,
            tile=_tile_for(faces_per_pixel, face_verts.shape[0], H),
        )
        need = max(int(need), 1)
        mft = 1 << (need - 1).bit_length()

    def band(fv, ok):
        ty0 = jax.lax.axis_index(axis).astype(jnp.int32) * n_ty_band
        return rasterize_fragments_pallas_band(
            fv, ok, ty0, (H, W), blur_radius, faces_per_pixel,
            perspective_correct, clip_barycentric_coords, cull_backfaces,
            mft, n_ty_band,
        )

    spec_px = P(axis)
    return shard_map(
        band,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(spec_px, spec_px, spec_px, spec_px),
        check_rep=False,
    )(face_verts, valid)
