"""Voxel-grid implicit function (DVGO/TensoRF style).

Parity: reference
implicitron/models/implicit_function/voxel_grid_implicit_function.py
(`VoxelGridImplicitFunction`): density grid + color grid + small decoding
MLPs, evaluated on ray points.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ....renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ....renderer.implicit.utils import ray_bundle_to_ray_points
from ...tools.config import registry
from .base import ImplicitFunctionBase
from .voxel_grid import (
    CPFactorizedVoxelGrid,
    FullResolutionVoxelGrid,
    VMFactorizedVoxelGrid,
)

_GRIDS = {
    "full": FullResolutionVoxelGrid,
    "cp": CPFactorizedVoxelGrid,
    "vm": VMFactorizedVoxelGrid,
}


@registry.register
class VoxelGridImplicitFunction(nn.Module, ImplicitFunctionBase):
    grid_type: str = "vm"
    resolution: Tuple[int, int, int] = (64, 64, 64)
    n_components: int = 24
    n_features_density: int = 1
    n_features_color: int = 27
    n_hidden_color: int = 64
    n_harmonic_functions_dir: int = 2
    scene_extent: float = 2.0  # points scaled by 1/extent into [-1, 1]

    def setup(self):
        grid_cls = _GRIDS[self.grid_type]
        kw = {}
        if self.grid_type in ("cp", "vm"):
            kw["n_components"] = self.n_components
        self.density_grid = grid_cls(
            n_features=self.n_features_density,
            resolution=self.resolution,
            **kw,
        )
        self.color_grid = grid_cls(
            n_features=self.n_features_color,
            resolution=self.resolution,
            **kw,
        )
        self.dir_embed = HarmonicEmbedding(self.n_harmonic_functions_dir)
        self.color_mlp_hidden = nn.Dense(self.n_hidden_color)
        self.color_mlp_out = nn.Dense(3)

    def __call__(
        self, ray_bundle, density_noise_std: float = 0.0, **kwargs
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pts = ray_bundle_to_ray_points(ray_bundle)  # (..., S, 3)
        pts_local = pts / self.scene_extent

        raw_density = self.density_grid(pts_local)  # (..., S, 1)
        densities = 1.0 - jnp.exp(-nn.softplus(raw_density))

        color_feats = self.color_grid(pts_local)  # (..., S, Cc)
        d = ray_bundle.directions
        d = d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        d_embed = self.dir_embed(d)
        d_embed = jnp.broadcast_to(
            d_embed[..., None, :], pts.shape[:-1] + (d_embed.shape[-1],)
        )
        h = nn.relu(
            self.color_mlp_hidden(
                jnp.concatenate([color_feats, d_embed], axis=-1)
            )
        )
        colors = nn.sigmoid(self.color_mlp_out(h))
        return densities, colors
