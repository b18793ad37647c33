"""NeRF project utilities (reference projects/nerf/nerf/utils.py):
`sample_images_at_mc_locs`, `calc_mse`, `calc_psnr`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.grid_sample import grid_sample


def calc_mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def calc_psnr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.clip(calc_mse(x, y), 1e-12))


def sample_images_at_mc_locs(
    target_images: jnp.ndarray,  # (B, H, W, C)
    sampled_rays_xy: jnp.ndarray,  # (B, ..., 2) NDC xy (+X left, +Y up)
) -> jnp.ndarray:
    """Sample image colors at NDC ray locations (reference utils.py).

    Returns (B, ..., C).
    """
    B = target_images.shape[0]
    C = target_images.shape[-1]
    spatial = sampled_rays_xy.shape[1:-1]
    xy = sampled_rays_xy.reshape(B, -1, 2)
    # our NDC has +X left / +Y up; grid_sample has +x right / +y down
    grid = -xy[:, None]  # (B, 1, R, 2)
    imgs = jnp.transpose(target_images, (0, 3, 1, 2))  # (B, C, H, W)
    out = grid_sample(imgs, grid, mode="bilinear", padding_mode="border",
                      align_corners=False)  # (B, C, 1, R)
    out = jnp.transpose(out[:, :, 0], (0, 2, 1))  # (B, R, C)
    return out.reshape((B,) + spatial + (C,))
