"""Importance resampling of ray points from EA weights.

Parity: reference implicitron/models/renderer/ray_point_refiner.py:16.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ....renderer.implicit.sample_pdf import sample_pdf
from ...tools.config import Configurable
from .base import ImplicitronRayBundle


def apply_blurpool_on_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """2-tap max filter followed by a 2-tap blur: a wide, smooth upper
    envelope on the weights (mip-NeRF; reference ray_point_refiner.py:121)."""
    wp = jnp.concatenate([weights[..., :1], weights, weights[..., -1:]], axis=-1)
    weights_max = jnp.maximum(wp[..., :-1], wp[..., 1:])
    return 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])


@dataclasses.dataclass
class RayPointRefiner(Configurable):
    n_pts_per_ray: int = 64
    random_sampling: bool = True
    add_input_samples: bool = True

    def __call__(
        self,
        input_ray_bundle: ImplicitronRayBundle,
        ray_weights: jnp.ndarray,
        blurpool_weights: bool = False,
        sample_pdf_eps: float = 1e-5,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> ImplicitronRayBundle:
        z_vals = input_ray_bundle.lengths
        w = ray_weights
        if blurpool_weights:
            w = apply_blurpool_on_weights(w) + 0.01
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_new = sample_pdf(
            z_mid,
            w[..., 1:-1],
            self.n_pts_per_ray,
            det=not self.random_sampling,
            eps=sample_pdf_eps,
            key=key,
        )
        z_new = jax.lax.stop_gradient(z_new)
        if self.add_input_samples:
            z_new = jnp.concatenate([z_vals, z_new], axis=-1)
        z_new = jnp.sort(z_new, axis=-1)
        return ImplicitronRayBundle(
            origins=input_ray_bundle.origins,
            directions=input_ray_bundle.directions,
            lengths=z_new,
            xys=input_ray_bundle.xys,
        )
