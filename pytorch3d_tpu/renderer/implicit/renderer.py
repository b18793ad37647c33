"""Implicit and volume renderers.

Parity: reference renderer/implicit/renderer.py:34 (`ImplicitRenderer`),
:206 (`VolumeRenderer`), :260 (`VolumeSampler`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from ...ops.grid_sample import grid_sample
from .raysampling import MonteCarloRaysampler, MultinomialRaysampler
from .utils import RayBundle, ray_bundle_to_ray_points


class ImplicitRenderer:
    """raysampler -> user volumetric_function -> raymarcher (reference :34).

    The volumetric_function signature is
    ``fn(ray_bundle=..., cameras=..., **kwargs) -> (densities, features)``
    with densities (..., n_pts, 1) and features (..., n_pts, C).
    """

    def __init__(self, raysampler: Callable, raymarcher: Callable) -> None:
        if not callable(raysampler):
            raise ValueError('"raysampler" has to be a "Callable" object.')
        if not callable(raymarcher):
            raise ValueError('"raymarcher" has to be a "Callable" object.')
        self.raysampler = raysampler
        self.raymarcher = raymarcher

    def __call__(self, cameras, volumetric_function, **kwargs) -> Tuple:
        if not callable(volumetric_function):
            raise ValueError('"volumetric_function" has to be a "Callable" object.')
        ray_bundle = self.raysampler(cameras=cameras, **kwargs)
        rays_densities, rays_features = volumetric_function(
            ray_bundle=ray_bundle, cameras=cameras, **kwargs
        )
        images = self.raymarcher(
            rays_densities=rays_densities,
            rays_features=rays_features,
            ray_bundle=ray_bundle,
            **kwargs,
        )
        return images, ray_bundle

    forward = __call__


class VolumeSampler:
    """Sample a `Volumes` batch along rays with grid_sample (reference :260)."""

    def __init__(self, volumes, sample_mode: str = "bilinear", padding_mode: str = "zeros") -> None:
        self._volumes = volumes
        self._sample_mode = sample_mode
        self._padding_mode = padding_mode

    def _get_ray_directions_transform(self):
        """Directions transform: rotation-only part of world->local."""
        w2l = self._volumes.get_world_to_local_coords_transform().get_matrix()
        directions_transform = w2l.at[:, 3, :3].set(0.0)
        return directions_transform

    def __call__(self, ray_bundle, **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pts_world = ray_bundle_to_ray_points(ray_bundle)  # (B, ..., S, 3)
        B = pts_world.shape[0]
        spatial = pts_world.shape[1:-1]
        pts_flat = pts_world.reshape(B, -1, 3)
        pts_local = self._volumes.world_to_local_coords(pts_flat)

        densities = self._volumes.densities()  # (B, C_d, D, H, W)
        features = self._volumes.features()  # (B, C_f, D, H, W) | None

        # grid_sample 3D expects grid (B, Do, Ho, Wo, 3) in xyz order.
        grid = pts_local.reshape(B, 1, 1, -1, 3)
        dens = grid_sample(
            densities, grid, mode=self._sample_mode,
            padding_mode=self._padding_mode, align_corners=self._volumes.get_align_corners(),
        )  # (B, C_d, 1, 1, P)
        dens = jnp.moveaxis(dens.reshape(B, densities.shape[1], -1), 1, -1)
        rays_densities = dens.reshape((B,) + spatial + (densities.shape[1],))

        if features is None:
            rays_features = jnp.zeros(
                (B,) + spatial + (0,), rays_densities.dtype
            )
        else:
            feats = grid_sample(
                features, grid, mode=self._sample_mode,
                padding_mode=self._padding_mode,
                align_corners=self._volumes.get_align_corners(),
            )
            feats = jnp.moveaxis(feats.reshape(B, features.shape[1], -1), 1, -1)
            rays_features = feats.reshape((B,) + spatial + (features.shape[1],))
        return rays_densities, rays_features


class VolumeRenderer:
    """raysampler + VolumeSampler + raymarcher (reference :206)."""

    def __init__(self, raysampler: Callable, raymarcher: Callable,
                 sample_mode: str = "bilinear") -> None:
        self._renderer = ImplicitRenderer(raysampler, raymarcher)
        self._sample_mode = sample_mode

    def __call__(self, cameras, volumes, **kwargs) -> Tuple:
        volumetric_function = VolumeSampler(volumes, sample_mode=self._sample_mode)
        return self._renderer(
            cameras=cameras, volumetric_function=volumetric_function, **kwargs
        )

    forward = __call__
