"""PointsRenderer = rasterizer + compositor (reference renderer/points/renderer.py:30).

Weights are 1 - dist^2 / r^2 (reference :62-66).
"""

from __future__ import annotations

import jax.numpy as jnp


class PointsRenderer:
    def __init__(self, rasterizer, compositor):
        self.rasterizer = rasterizer
        self.compositor = compositor

    def __call__(self, point_clouds, **kwargs):
        return self.forward(point_clouds, **kwargs)

    def forward(self, point_clouds, **kwargs) -> jnp.ndarray:
        fragments = self.rasterizer(point_clouds, **kwargs)
        raster_settings = kwargs.get(
            "raster_settings", self.rasterizer.raster_settings
        )
        r = raster_settings.radius

        dists2 = jnp.transpose(fragments.dists, (0, 3, 1, 2))  # (N, K, H, W)
        if not isinstance(r, (float, int)):
            # per-point radius: gather each fragment's own radius
            from .rasterize_points import _format_radius

            r_packed = _format_radius(r, point_clouds)
            idxs = jnp.transpose(fragments.idx, (0, 3, 1, 2))
            r = jnp.where(idxs >= 0, r_packed[jnp.maximum(idxs, 0)], 1.0)
        weights = 1.0 - dists2 / (r * r)
        weights = jnp.where(
            jnp.transpose(fragments.idx, (0, 3, 1, 2)) >= 0, weights, 0.0
        )

        features = point_clouds.features_packed()  # (sum P, C)
        images = self.compositor(
            jnp.transpose(fragments.idx, (0, 3, 1, 2)),
            weights,
            jnp.transpose(features, (1, 0)),
            **kwargs,
        )
        # (N, C, H, W) -> (N, H, W, C)
        return jnp.transpose(images, (0, 2, 3, 1))
