"""Raymarchers: emission-absorption and absorption-only.

Parity: reference renderer/implicit/raymarching.py:15 (EA, weights via
shifted cumprod :166), :114 (AbsorptionOnly).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp


def _shifted_cumprod(x: jnp.ndarray, shift: int = 1) -> jnp.ndarray:
    """cumprod shifted right by `shift` with 1-padding (reference :166)."""
    cp = jnp.cumprod(x, axis=-1)
    return jnp.concatenate(
        [jnp.ones_like(cp[..., :shift]), cp[..., :-shift]], axis=-1
    )


def _check_raymarcher_inputs(rays_densities, rays_features, rays_z,
                             features_can_be_none=False, z_can_be_none=True,
                             density_1d=True):
    if rays_densities.ndim < 1:
        raise ValueError("rays_densities have to have at least one dimension.")
    if density_1d and rays_densities.shape[-1] != 1:
        raise ValueError("The size of the last dimension of rays_densities has to be one.")


class EmissionAbsorptionRaymarcher:
    """EA marching: weights = alpha_i * prod_{j<i}(1 - alpha_j)
    (reference raymarching.py:15).

    Returns (..., C + 1) features + opacity.
    """

    def __init__(self, surface_thickness: int = 1) -> None:
        self.surface_thickness = surface_thickness

    def __call__(
        self,
        rays_densities: jnp.ndarray,  # (..., n_pts, 1)
        rays_features: jnp.ndarray,  # (..., n_pts, C)
        eps: float = 1e-10,
        **kwargs,
    ) -> jnp.ndarray:
        _check_raymarcher_inputs(rays_densities, rays_features, None)
        rays_densities = rays_densities[..., 0]
        absorption = _shifted_cumprod(
            (1.0 + eps) - rays_densities, shift=self.surface_thickness
        )
        weights = rays_densities * absorption
        features = jnp.sum(weights[..., None] * rays_features, axis=-2)
        opacities = 1.0 - jnp.prod(1.0 - rays_densities, axis=-1, keepdims=True)
        return jnp.concatenate([features, opacities], axis=-1)


class AbsorptionOnlyRaymarcher:
    """Total absorption: 1 - prod(1 - density) (reference raymarching.py:114)."""

    def __call__(self, rays_densities: jnp.ndarray, **kwargs) -> jnp.ndarray:
        _check_raymarcher_inputs(
            rays_densities, None, None, features_can_be_none=True
        )
        rays_densities = rays_densities[..., 0]
        total_transmission = jnp.prod(
            1.0 - jnp.clip(rays_densities, 0.0, 1.0), axis=-1, keepdims=True
        )
        return 1.0 - total_transmission
