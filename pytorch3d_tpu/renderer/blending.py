"""Blending functions (parity: reference renderer/blending.py).

All three blends are pure VPU math; on TPU they fuse into the shading
epilogue under jit (the reference needs a custom CUDA kernel for the
sigmoid blend backward — XLA autodiff covers it here).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp


class BlendParams(NamedTuple):
    """Parameters for soft blending (reference blending.py:20)."""

    sigma: float = 1e-4
    gamma: float = 1e-4
    background_color: Union[Tuple[float, float, float], jnp.ndarray] = (1.0, 1.0, 1.0)


def _get_background_color(blend_params: BlendParams, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(blend_params.background_color, dtype=dtype)


def hard_rgb_blend(
    colors: jnp.ndarray, fragments, blend_params: BlendParams
) -> jnp.ndarray:
    """Pick the closest face's color; alpha = foreground mask.

    colors: (N, H, W, K, 3); returns (N, H, W, 4).
    """
    background_color = _get_background_color(blend_params, colors.dtype)
    is_background = fragments.pix_to_face[..., 0] < 0  # (N, H, W)
    pixel_colors = jnp.where(
        is_background[..., None], background_color, colors[..., 0, :]
    )
    alpha = (~is_background).astype(colors.dtype)[..., None]
    return jnp.concatenate([pixel_colors, alpha], axis=-1)


def _sigmoid_alpha(dists: jnp.ndarray, pix_to_face: jnp.ndarray, sigma: float):
    mask = pix_to_face >= 0
    prob_map = jax.nn.sigmoid(-dists / sigma) * mask
    return 1.0 - jnp.prod(1.0 - prob_map, axis=-1)


def sigmoid_alpha_blend(colors, fragments, blend_params: BlendParams) -> jnp.ndarray:
    """Silhouette blending (SoftRas [Liu et al 2019]); returns (N, H, W, 4)."""
    pixel_rgb = colors[..., 0, :]
    alpha = _sigmoid_alpha(
        fragments.dists, fragments.pix_to_face, blend_params.sigma
    )
    return jnp.concatenate([pixel_rgb, alpha[..., None]], axis=-1)


def softmax_rgb_blend(
    colors: jnp.ndarray,
    fragments,
    blend_params: BlendParams,
    znear: Union[float, jnp.ndarray] = 1.0,
    zfar: Union[float, jnp.ndarray] = 100.0,
) -> jnp.ndarray:
    """SoftRas z-weighted softmax blending (reference blending.py:147).

    colors: (N, H, W, K, 3); fragments provides pix_to_face/dists/zbuf of
    shape (N, H, W, K).  Returns (N, H, W, 4).
    """
    eps = 1e-10
    background_color = _get_background_color(blend_params, colors.dtype)
    mask = fragments.pix_to_face >= 0

    prob_map = jax.nn.sigmoid(-fragments.dists / blend_params.sigma) * mask
    alpha = 1.0 - jnp.prod(1.0 - prob_map, axis=-1)

    if isinstance(zfar, jnp.ndarray) and zfar.ndim == 1:
        zfar = zfar[:, None, None, None]
    if isinstance(znear, jnp.ndarray) and znear.ndim == 1:
        znear = znear[:, None, None, None]

    z_inv = (zfar - fragments.zbuf) / (zfar - znear) * mask
    z_inv_max = jnp.maximum(jnp.max(z_inv, axis=-1, keepdims=True), eps)
    weights_num = prob_map * jnp.exp((z_inv - z_inv_max) / blend_params.gamma)
    delta = jnp.maximum(jnp.exp((eps - z_inv_max) / blend_params.gamma), eps)
    denom = jnp.sum(weights_num, axis=-1, keepdims=True) + delta
    weighted_colors = jnp.sum(weights_num[..., None] * colors, axis=-2)
    weighted_background = delta * background_color
    pixel_rgb = (weighted_colors + weighted_background) / denom
    return jnp.concatenate([pixel_rgb, alpha[..., None]], axis=-1)

