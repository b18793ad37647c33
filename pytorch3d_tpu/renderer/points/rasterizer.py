"""PointsRasterizer: camera transform + point rasterization.

Parity: reference renderer/points/rasterizer.py (:21 PointFragments,
:51 settings, :81 rasterizer).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp
from flax import struct

from ..cameras import try_get_projection_transform
from .rasterize_points import rasterize_points


@struct.dataclass
class PointFragments:
    idx: jnp.ndarray  # (N, H, W, K) packed point ids, -1 empty
    zbuf: jnp.ndarray  # (N, H, W, K)
    dists: jnp.ndarray  # (N, H, W, K) squared NDC distances


class PointsRasterizationSettings(NamedTuple):
    image_size: Union[int, Tuple[int, int]] = 256
    radius: Union[float, jnp.ndarray] = 0.01
    points_per_pixel: int = 8
    bin_size: Optional[int] = None
    max_points_per_bin: Optional[int] = None


class PointsRasterizer:
    """Rasterize world-space pointclouds with a camera (reference :81)."""

    def __init__(self, cameras=None, raster_settings=None):
        self.cameras = cameras
        self.raster_settings = raster_settings or PointsRasterizationSettings()

    def transform(self, point_clouds, **kwargs):
        """World -> NDC-xy with view-space z kept (reference :105-139)."""
        cameras = kwargs.get("cameras", self.cameras)
        if cameras is None:
            raise ValueError(
                "Cameras must be specified either at initialization or in the "
                "forward pass of PointsRasterizer"
            )
        pts_world = point_clouds.points_padded()
        eps = kwargs.get("eps", None)
        w2v = cameras.get_world_to_view_transform(**kwargs)
        pts_view = w2v.transform_points(pts_world, eps=eps)
        to_ndc = cameras.get_ndc_camera_transform(**kwargs)
        projection = try_get_projection_transform(cameras, kwargs)
        if projection is not None:
            projection = projection.compose(to_ndc)
            pts_ndc = projection.transform_points(pts_view, eps=eps)
        else:
            pts_proj = cameras.transform_points(pts_world, eps=eps)
            pts_ndc = to_ndc.transform_points(pts_proj, eps=eps)
        pts_ndc = pts_ndc.at[..., 2].set(pts_view[..., 2])
        return point_clouds.update_padded(pts_ndc)

    def __call__(self, point_clouds, **kwargs) -> PointFragments:
        return self.forward(point_clouds, **kwargs)

    def forward(self, point_clouds, **kwargs) -> PointFragments:
        clouds_ndc = self.transform(point_clouds, **kwargs)
        raster_settings = kwargs.get("raster_settings", self.raster_settings)
        idx, zbuf, dists = rasterize_points(
            clouds_ndc,
            image_size=raster_settings.image_size,
            radius=raster_settings.radius,
            points_per_pixel=raster_settings.points_per_pixel,
            bin_size=raster_settings.bin_size,
            max_points_per_bin=raster_settings.max_points_per_bin,
        )
        return PointFragments(idx=idx, zbuf=zbuf, dists=dists)
