"""Image helpers (reference implicitron/tools/image_utils.py:15)."""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp


def mask_background(
    image_rgb: jnp.ndarray,  # (..., H, W, 3) channels-last
    mask_fg: jnp.ndarray,  # (..., H, W, 1)
    dim_color: int = -1,
    bg_color: Union[jnp.ndarray, str, float, Sequence[float]] = 0.0,
) -> jnp.ndarray:
    """Fill background pixels with bg_color (reference :15)."""
    if isinstance(bg_color, str):
        if bg_color == "white":
            bg = jnp.ones((3,), image_rgb.dtype)
        elif bg_color == "black":
            bg = jnp.zeros((3,), image_rgb.dtype)
        else:
            raise ValueError(f"Unknown bg_color={bg_color}.")
    else:
        bg = jnp.broadcast_to(
            jnp.asarray(bg_color, image_rgb.dtype), (3,)
        )
    return image_rgb * mask_fg + (1.0 - mask_fg) * bg
