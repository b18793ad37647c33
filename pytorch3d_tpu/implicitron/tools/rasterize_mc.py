"""Rasterize Monte-Carlo-sampled colored points to an image.

Parity: reference implicitron/tools/rasterize_mc.py (`rasterize_sparse_ray_bundle`,
`rasterize_mc_samples`): used to visualize MC ray samples as images.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def rasterize_mc_samples(
    xys: jnp.ndarray,  # (B, P, 2) NDC sample locations
    feats: jnp.ndarray,  # (B, P, C)
    image_size_hw: Tuple[int, int],
    radius: float = 0.03,
    masks: Optional[jnp.ndarray] = None,  # (B, P, 1)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splat sparse samples into (B, H, W, C) + weight mask (reference)."""
    H, W = image_size_hw
    B, P, C = feats.shape
    if masks is None:
        masks = jnp.ones((B, P, 1), feats.dtype)

    # nearest-pixel splat with scatter-add (host-scale sizes)
    s = min(H, W)
    col = jnp.clip(
        jnp.round(W / 2.0 - xys[..., 0] * s / 2.0 - 0.5), 0, W - 1
    ).astype(jnp.int32)
    row = jnp.clip(
        jnp.round(H / 2.0 - xys[..., 1] * s / 2.0 - 0.5), 0, H - 1
    ).astype(jnp.int32)
    flat = row * W + col  # (B, P)

    def one(fl, ft, mk):
        img = jnp.zeros((H * W, C), ft.dtype).at[fl].add(ft * mk)
        wsum = jnp.zeros((H * W, 1), ft.dtype).at[fl].add(mk)
        img = img / jnp.clip(wsum, 1e-9)
        return img.reshape(H, W, C), (wsum > 0).astype(ft.dtype).reshape(H, W, 1)

    import jax

    images, hit = jax.vmap(one)(flat, feats, masks)
    return images, hit


def rasterize_sparse_ray_bundle(
    ray_bundle, features: jnp.ndarray, image_size_hw: Tuple[int, int],
    depth: Optional[jnp.ndarray] = None, masks=None,
):
    """Rasterize ray-bundle samples (+depth channel) (reference)."""
    feats = features
    if depth is not None:
        feats = jnp.concatenate([feats, depth], axis=-1)
    xys = ray_bundle.xys.reshape(feats.shape[0], -1, 2)
    return rasterize_mc_samples(
        xys, feats.reshape(feats.shape[0], -1, feats.shape[-1]),
        image_size_hw, masks=masks,
    )
