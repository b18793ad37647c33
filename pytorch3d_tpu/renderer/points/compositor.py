"""Compositor modules wrapping the compositing functionals.

Parity: reference renderer/points/compositor.py:22 (`AlphaCompositor`),
:44 (`NormWeightedCompositor`), background color handling :66.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

from .compositing import alpha_composite, norm_weighted_sum


def _add_background_color_to_images(pix_idxs, images, background_color):
    """Fill pixels with no points with the background color (reference :66).

    images: (N, C, H, W); background_color: (C,) or (C-1,) (alpha appended).
    """
    background_mask = jnp.all(pix_idxs < 0, axis=1)  # (N, H, W)
    bg = jnp.asarray(background_color, images.dtype)
    if bg.shape[0] == images.shape[1] - 1:
        bg = jnp.concatenate([bg, jnp.ones((1,), bg.dtype)])
    return jnp.where(
        background_mask[:, None], bg[None, :, None, None], images
    )


class AlphaCompositor:
    """Front-to-back alpha compositing (reference :22)."""

    def __init__(self, background_color: Optional[Sequence[float]] = None):
        self.background_color = background_color

    def __call__(self, fragments, alphas, ptclds, **kwargs):
        background_color = kwargs.get("background_color", self.background_color)
        images = alpha_composite(fragments, alphas, ptclds)
        if background_color is not None:
            return _add_background_color_to_images(fragments, images, background_color)
        return images

    forward = __call__


class NormWeightedCompositor:
    """Normalized weighted-sum compositing (reference :44)."""

    def __init__(self, background_color: Optional[Sequence[float]] = None):
        self.background_color = background_color

    def __call__(self, fragments, alphas, ptclds, **kwargs):
        background_color = kwargs.get("background_color", self.background_color)
        images = norm_weighted_sum(fragments, alphas, ptclds)
        if background_color is not None:
            return _add_background_color_to_images(fragments, images, background_color)
        return images

    forward = __call__
