"""Ray bundle containers and helpers.

Parity: reference renderer/implicit/utils.py:15 (`RayBundle`), :37
(`HeterogeneousRayBundle`), :69 (`ray_bundle_to_ray_points`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RayBundle:
    """Bundle of rays: origins/directions (..., 3), lengths (..., S),
    xys (..., 2) image-plane locations."""

    origins: jnp.ndarray
    directions: jnp.ndarray
    lengths: jnp.ndarray
    xys: jnp.ndarray


@struct.dataclass
class HeterogeneousRayBundle:
    """Packed rays from multiple cameras (reference :37)."""

    origins: jnp.ndarray
    directions: jnp.ndarray
    lengths: jnp.ndarray
    xys: jnp.ndarray
    camera_ids: Optional[jnp.ndarray] = None
    camera_counts: Optional[jnp.ndarray] = None


def ray_bundle_to_ray_points(ray_bundle) -> jnp.ndarray:
    """World points at each depth: o + l * d (reference :69)."""
    return ray_bundle_variables_to_ray_points(
        ray_bundle.origins, ray_bundle.directions, ray_bundle.lengths
    )


def ray_bundle_variables_to_ray_points(
    rays_origins: jnp.ndarray,  # (..., 3)
    rays_directions: jnp.ndarray,  # (..., 3)
    rays_lengths: jnp.ndarray,  # (..., S)
) -> jnp.ndarray:
    """(..., S, 3) = origins[..., None, :] + lengths[..., :, None] * dirs."""
    return (
        rays_origins[..., None, :]
        + rays_lengths[..., :, None] * rays_directions[..., None, :]
    )
