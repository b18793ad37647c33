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
            # max-blur the weights (mip-NeRF style, reference :95)
            wp = jnp.concatenate([w[..., :1], w, w[..., -1:]], axis=-1)
            w = 0.5 * (
                jnp.maximum(wp[..., :-1], wp[..., 1:])[..., :-1]
                + jnp.maximum(wp[..., :-1], wp[..., 1:])[..., 1:]
            ) + 0.01
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
