"""Bilinear/trilinear grid sampling (torch.nn.functional.grid_sample parity).

JAX has no grid_sample; this implements the 4D and 5D cases used by the
framework (TexturesUV, VolumeSampler, vert_align, view sampling) as pure
gathers + lerps — XLA fuses these into efficient TPU code.

Conventions follow torch: `grid` values in [-1, 1], last dim ordered (x, y)
for 4D and (x, y, z) for 5D where x indexes W, y indexes H, z indexes D.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(image: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, padding_mode: str):
    """image (C, H, W); ix/iy integer index arrays of the same shape."""
    C, H, W = image.shape
    if padding_mode == "border":
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        valid = jnp.ones(ix.shape, bool)
    else:  # zeros
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
    # channel-LAST row gather: indexing the (C, H, W) layout directly
    # costs C scalar gathers H*W apart per sample point; gathering
    # (H, W, C) rows fetches each pixel's channels contiguously (the
    # round-4 minor-axis-gather lesson, benchmarks/PERF_ANALYSIS.md)
    vals = jnp.moveaxis(jnp.moveaxis(image, 0, -1)[iy, ix], -1, 0)
    return jnp.where(valid[None], vals, 0.0)


def grid_sample(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """2D: input (N, C, H, W), grid (N, Ho, Wo, 2) -> (N, C, Ho, Wo).
    3D: input (N, C, D, H, W), grid (N, Do, Ho, Wo, 3) -> (N, C, Do, Ho, Wo).
    """
    if input.ndim == 4:
        return _grid_sample_2d(input, grid, mode, padding_mode, align_corners)
    if input.ndim == 5:
        return _grid_sample_3d(input, grid, mode, padding_mode, align_corners)
    raise ValueError(f"grid_sample expects 4D or 5D input; got {input.ndim}D")


def _grid_sample_2d(input, grid, mode, padding_mode, align_corners):
    N, C, H, W = input.shape
    out_shape = grid.shape[1:-1]
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    import jax

    def sample_one(img, xx, yy):
        if mode == "nearest":
            ix = jnp.round(xx).astype(jnp.int32)
            iy = jnp.round(yy).astype(jnp.int32)
            return _gather_2d(img, ix, iy, padding_mode)
        x0 = jnp.floor(xx)
        y0 = jnp.floor(yy)
        wx = xx - x0
        wy = yy - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        v00 = _gather_2d(img, x0, y0, padding_mode)
        v01 = _gather_2d(img, x0 + 1, y0, padding_mode)
        v10 = _gather_2d(img, x0, y0 + 1, padding_mode)
        v11 = _gather_2d(img, x0 + 1, y0 + 1, padding_mode)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    out = jax.vmap(sample_one)(input, x, y)
    return out.reshape((N, C) + out_shape)


def _gather_3d(vol, ix, iy, iz, padding_mode):
    C, D, H, W = vol.shape
    if padding_mode == "border":
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        iz = jnp.clip(iz, 0, D - 1)
        valid = jnp.ones(ix.shape, bool)
    else:
        valid = (
            (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            & (iz >= 0) & (iz <= D - 1)
        )
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        iz = jnp.clip(iz, 0, D - 1)
    # channel-last row gather (see _gather_2d)
    vals = jnp.moveaxis(jnp.moveaxis(vol, 0, -1)[iz, iy, ix], -1, 0)
    return jnp.where(valid[None], vals, 0.0)


def _grid_sample_3d(input, grid, mode, padding_mode, align_corners):
    N, C, D, H, W = input.shape
    out_shape = grid.shape[1:-1]
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)

    import jax

    def sample_one(vol, xx, yy, zz):
        if mode == "nearest":
            return _gather_3d(
                vol,
                jnp.round(xx).astype(jnp.int32),
                jnp.round(yy).astype(jnp.int32),
                jnp.round(zz).astype(jnp.int32),
                padding_mode,
            )
        x0 = jnp.floor(xx); y0 = jnp.floor(yy); z0 = jnp.floor(zz)
        wx = xx - x0; wy = yy - y0; wz = zz - z0
        x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32); z0 = z0.astype(jnp.int32)
        out = 0.0
        for dz, fz in ((0, 1 - wz), (1, wz)):
            for dy, fy in ((0, 1 - wy), (1, wy)):
                for dx, fx in ((0, 1 - wx), (1, wx)):
                    v = _gather_3d(vol, x0 + dx, y0 + dy, z0 + dz, padding_mode)
                    out = out + v * (fx * fy * fz)[None]
        return out

    out = jax.vmap(sample_one)(input, x, y, z)
    return out.reshape((N, C) + out_shape)
