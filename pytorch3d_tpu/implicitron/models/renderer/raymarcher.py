"""Implicitron raymarchers.

Parity: reference implicitron/models/renderer/raymarcher.py
(`RaymarcherBase` :33, `AccumulativeRaymarcherBase` :47,
`EmissionAbsorptionRaymarcher` :218, `CumsumRaymarcher` :235).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from ....renderer.implicit.raymarching import _shifted_cumprod
from ...tools.config import ReplaceableBase, registry
from .base import RendererOutput


class RaymarcherBase(ReplaceableBase):
    def __call__(self, rays_densities, rays_features, aux, **kwargs):
        raise NotImplementedError


@dataclasses.dataclass
class AccumulativeRaymarcherBase(RaymarcherBase):
    """Weighted accumulation along rays (reference :47)."""

    surface_thickness: int = 1
    bg_color: Tuple[float, ...] = (0.0,)
    replicate_last_interval: bool = False
    background_opacity: float = 0.0
    density_relu: bool = True
    blend_output: bool = False

    def _capping_function(self, rays_densities: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def _weight_function(
        self, rays_densities: jnp.ndarray, absorption: jnp.ndarray
    ) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(
        self,
        rays_densities: jnp.ndarray,  # (..., S, 1)
        rays_features: jnp.ndarray,  # (..., S, C)
        aux: Optional[Dict[str, Any]] = None,
        ray_lengths: Optional[jnp.ndarray] = None,
        density_noise_std: float = 0.0,
        **kwargs,
    ) -> RendererOutput:
        ray_lengths = (
            ray_lengths
            if ray_lengths is not None
            else jnp.zeros(rays_densities.shape[:-1])
        )
        # convert densities to per-interval opacities using interval lengths
        deltas = jnp.concatenate(
            [
                ray_lengths[..., 1:] - ray_lengths[..., :-1],
                (
                    ray_lengths[..., -1:] - ray_lengths[..., -2:-1]
                    if self.replicate_last_interval and ray_lengths.shape[-1] > 1
                    else jnp.full_like(ray_lengths[..., :1], self.background_opacity)
                ),
            ],
            axis=-1,
        )
        rays_densities = rays_densities[..., 0]
        if self.density_relu:
            rays_densities = jnp.maximum(rays_densities, 0.0)
        weighted_densities = deltas * rays_densities
        capped = self._capping_function(weighted_densities)  # (..., S)

        absorption = _shifted_cumprod(
            (1.0 + 1e-10) - capped, shift=self.surface_thickness
        )
        weights = self._weight_function(capped, absorption)
        features = jnp.sum(weights[..., None] * rays_features, axis=-2)
        depth = jnp.sum(weights * ray_lengths, axis=-1, keepdims=True)
        alpha = jnp.clip(
            jnp.sum(weights, axis=-1, keepdims=True), 0.0, 1.0
        )
        if self.blend_output:
            bg = jnp.asarray(self.bg_color, features.dtype)
            features = features + (1.0 - alpha) * bg
        return RendererOutput(
            features=features,
            depths=depth,
            masks=alpha,
            weights=weights,
            aux=aux or {},
        )


@registry.register
@dataclasses.dataclass
class EmissionAbsorptionRaymarcher(AccumulativeRaymarcherBase):
    """EA: cap = 1 - exp(-x); weight = cap * absorption (reference :218)."""

    background_opacity: float = 1e10

    def _capping_function(self, x):
        return 1.0 - jnp.exp(-x)

    def _weight_function(self, cap, absorption):
        return cap * absorption


@registry.register
@dataclasses.dataclass
class CumsumRaymarcher(AccumulativeRaymarcherBase):
    """Cumulative-sum marcher of NeuralVolumes (reference :235)."""

    def _capping_function(self, x):
        return x

    def _weight_function(self, cap, absorption):
        return cap * jnp.clip(absorption, 0.0, 1.0)
