"""Differentiable point rasterization, TPU-native.

Parity: reference renderer/points/rasterize_points.py:24 +
csrc/rasterize_points/ (naive kernel :87, fine :223, backward :366).

Same two-pass architecture as the mesh rasterizer
(renderer/mesh/rasterize_meshes.py): a non-differentiable top-K selection
pass (scan over point chunks, per-pixel running K-smallest-z buffer) and a
differentiable recompute of zbuf/dists at the selected indices, whose
backward is an XLA gather transpose instead of the reference's atomicAdd
kernel.

Conventions: points are NDC-xy (+X left, +Y up) with view-space z; pixel
(0, 0) is top-left; dists are squared NDC distances in the image plane;
radius is in NDC units.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..mesh.rasterize_meshes import pixel_grid_ndc


def _format_radius(radius, pointclouds) -> jnp.ndarray:
    """Scalar | (N,) | (N, P) | packed (sum P,) -> packed per-point radius
    (reference rasterize_points.py:145)."""
    N = len(pointclouds)
    P = pointclouds.max_points
    if isinstance(radius, (float, int)):
        return jnp.full((N * P,), float(radius), jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    if radius.ndim == 1 and radius.shape[0] == N:
        return jnp.tile(radius[:, None], (1, P)).reshape(-1)
    if radius.ndim == 2:
        return radius.reshape(-1)
    if radius.ndim == 1 and radius.shape[0] == N * P:
        return radius
    raise ValueError("radius must be a float, (N,), (N, P) or packed array")


@functools.partial(
    jax.jit, static_argnames=("image_size", "points_per_pixel", "chunk_size")
)
def rasterize_points_topk_xla(
    points: jnp.ndarray,  # (P, 3) one cloud, NDC xy + view z
    radius: jnp.ndarray,  # (P,)
    valid: jnp.ndarray,  # (P,) bool
    image_size: Tuple[int, int],
    points_per_pixel: int = 8,
    chunk_size: int = 1024,
) -> jnp.ndarray:
    """Per-pixel ascending-z top-K point indices; -1 where empty."""
    H, W = image_size
    P = points.shape[0]
    K = points_per_pixel
    C = min(chunk_size, P)
    n_chunks = -(-P // C)
    pad = n_chunks * C - P
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    rad = jnp.pad(radius, (0, pad))
    ok = jnp.pad(valid, (0, pad)) & (pts[:, 2] >= 0)

    yf, xf = pixel_grid_ndc(H, W, points.dtype)
    pxy = jnp.stack(jnp.meshgrid(yf, xf, indexing="ij")[::-1], axis=-1)  # (H, W, 2)

    pts_chunks = pts.reshape(n_chunks, C, 3)
    rad_chunks = rad.reshape(n_chunks, C)
    ok_chunks = ok.reshape(n_chunks, C)
    Kc = min(K, C)

    init_z = jnp.full((H, W, K), jnp.inf, points.dtype)
    init_idx = jnp.full((H, W, K), -1, jnp.int32)

    def step(carry, chunk):
        best_z, best_idx = carry
        pc, rc, okc, base = chunk
        d = pxy[:, :, None, :] - pc[None, None, :, :2]  # (H, W, C, 2)
        d2 = jnp.sum(d * d, axis=-1)
        covers = okc & (d2 < rc * rc)
        pz = jnp.where(covers, pc[None, None, :, 2], jnp.inf)
        neg_z, local = jax.lax.top_k(-pz, Kc)
        chunk_z = -neg_z
        chunk_idx = jnp.where(
            jnp.isinf(chunk_z), -1, base + local.astype(jnp.int32)
        )
        all_z = jnp.concatenate([best_z, chunk_z], axis=-1)
        all_idx = jnp.concatenate([best_idx, chunk_idx], axis=-1)
        order = jnp.argsort(all_z, axis=-1, stable=True)[..., :K]
        return (
            jnp.take_along_axis(all_z, order, axis=-1),
            jnp.take_along_axis(all_idx, order, axis=-1),
        ), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * C
    (_, idx), _ = jax.lax.scan(
        step, (init_z, init_idx), (pts_chunks, rad_chunks, ok_chunks, bases)
    )
    return idx


def recompute_point_fragments(
    points: jnp.ndarray,  # (P, 3) differentiable
    idx: jnp.ndarray,  # (H, W, K)
    image_size: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable (zbuf, dists2) at fixed selected indices."""
    H, W = image_size
    sel = jnp.maximum(idx, 0)
    p = points[sel]  # (H, W, K, 3)
    yf, xf = pixel_grid_ndc(H, W, points.dtype)
    pxy = jnp.stack(jnp.meshgrid(yf, xf, indexing="ij")[::-1], axis=-1)
    d = pxy[:, :, None, :] - p[..., :2]
    d2 = jnp.sum(d * d, axis=-1)
    empty = idx < 0
    zbuf = jnp.where(empty, -1.0, p[..., 2])
    dists = jnp.where(empty, -1.0, d2)
    return zbuf, dists


def rasterize_points(
    pointclouds,
    image_size: Union[int, Tuple[int, int]] = 256,
    radius: Union[float, jnp.ndarray] = 0.01,
    points_per_pixel: int = 8,
    bin_size: Optional[int] = None,
    max_points_per_bin: Optional[int] = None,
):
    """Rasterize NDC-space pointclouds (reference rasterize_points.py:24).

    Returns (idx, zbuf, dists2) each (N, H, W, K); idx holds *packed* point
    ids (cloud n's points live at rows [n*P, (n+1)*P)) or -1.  bin_size /
    max_points_per_bin are accepted for API parity; tiling is internal.
    """
    if isinstance(image_size, int):
        image_size = (image_size, image_size)
    H, W = image_size
    # reference rasterize_points.py parse_image_size semantics
    if not (isinstance(H, int) and isinstance(W, int) and H > 0 and W > 0):
        raise ValueError(
            f"image_size must be positive ints, got {image_size!r}"
        )
    N = len(pointclouds)
    P = pointclouds.max_points
    pts_padded = pointclouds.points_padded()  # (N, P, 3)
    mask = pointclouds.points_padded_mask()  # (N, P)
    rad = _format_radius(radius, pointclouds).reshape(N, P)

    use_pallas = jax.default_backend() == "tpu" and bin_size != 0
    if use_pallas:
        from .rasterize_points_pallas import (
            rasterize_points_fragments_pallas,
            required_tiles_per_point,
        )

        # host-side static sizing selects the O(P log) sort-based
        # binning; inside a trace fall back to the exact top_k binning
        mtpp = None
        if not isinstance(pts_padded, jax.core.Tracer):
            t = required_tiles_per_point(
                pts_padded.reshape(-1, 3),
                rad.reshape(-1),
                mask.reshape(-1),
                image_size,
            )
            mtpp = (max(int(t[0]), 1), max(int(t[1]), 1))

        def one_fused(pts, r, m):
            return rasterize_points_fragments_pallas(
                pts, r, m, image_size, points_per_pixel,
                max_points_per_bin, mtpp,
            )

        idx_local, zbuf, dists = jax.vmap(one_fused)(pts_padded, rad, mask)
    else:
        def one(pts, r, m):
            return rasterize_points_topk_xla(
                pts, r, m, image_size, points_per_pixel
            )

        idx_local = jax.vmap(one)(pts_padded, rad, mask)  # (N, H, W, K)

        def one_recompute(pts, ii):
            return recompute_point_fragments(pts, ii, image_size)

        zbuf, dists = jax.vmap(one_recompute)(pts_padded, idx_local)
    offset = (jnp.arange(N, dtype=jnp.int32) * P)[:, None, None, None]
    idx = jnp.where(idx_local >= 0, idx_local + offset, -1)
    return idx, zbuf, dists


def rasterize_points_python(pointclouds, image_size=256, radius=0.01,
                            points_per_pixel=8):
    """Reference-naming alias for the oracle path (same implementation)."""
    return rasterize_points(pointclouds, image_size, radius, points_per_pixel)
