"""NeRF EA raymarcher returning (features, weights).

Parity: reference projects/nerf/nerf/raymarcher.py:16
(`EmissionAbsorptionNeRFRaymarcher`: no final opacity concat; weights are
returned for importance resampling).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ...renderer.implicit.raymarching import _shifted_cumprod


class EmissionAbsorptionNeRFRaymarcher:
    def __init__(self, surface_thickness: int = 1) -> None:
        self.surface_thickness = surface_thickness

    def __call__(
        self,
        rays_densities: jnp.ndarray,  # (..., S, 1)
        rays_features: jnp.ndarray,  # (..., S, C)
        eps: float = 1e-10,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        rays_densities = rays_densities[..., 0]
        absorption = _shifted_cumprod(
            (1.0 + eps) - rays_densities, shift=self.surface_thickness
        )
        weights = rays_densities * absorption
        features = jnp.sum(weights[..., None] * rays_features, axis=-2)
        return features, weights
