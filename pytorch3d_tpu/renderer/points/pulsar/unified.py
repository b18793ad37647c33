"""PulsarPointsRenderer: pulsar with the standard PyTorch3D camera/
Pointclouds interface.

Parity: reference renderer/points/pulsar/unified.py:37.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ....transforms.rotation_conversions import matrix_to_axis_angle
from .renderer import Renderer


class PulsarPointsRenderer:
    """Wraps `pulsar.Renderer` to consume cameras + Pointclouds
    (reference unified.py:37)."""

    def __init__(
        self,
        rasterizer,
        compositor=None,  # unused (API parity; pulsar composites internally)
        n_channels: int = 3,
        max_num_spheres: int = int(1e6),
    ) -> None:
        self.rasterizer = rasterizer
        image_size = rasterizer.raster_settings.image_size
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        self.renderer = Renderer(
            width=image_size[1],
            height=image_size[0],
            max_num_balls=max_num_spheres,
            n_channels=n_channels,
        )

    def _extract_cam_params(self, cameras, znear: float):
        """Convert a PyTorch3D camera to the pulsar 8-vector."""
        R = cameras.R[0]  # (3, 3) row-vector world->view
        T = cameras.T[0]
        # camera center C = -T R^T (row conv)
        C = -(T @ jnp.swapaxes(R, 0, 1))
        axis_angle = matrix_to_axis_angle(R)
        if hasattr(cameras, "fov"):
            fov = cameras.fov[0]
            if getattr(cameras, "degrees", True):
                fov = fov * jnp.pi / 180.0
            focal = znear
            sensor = 2.0 * znear * jnp.tan(fov / 2.0)
        else:
            focal_ndc = jnp.asarray(cameras.focal_length)[0]
            f = focal_ndc[0] if focal_ndc.ndim > 0 else focal_ndc
            focal = znear
            sensor = 2.0 * znear / f
        return jnp.concatenate(
            [C, axis_angle, jnp.asarray([focal, sensor])]
        )

    def __call__(
        self,
        point_clouds,
        gamma: Tuple[float, ...] = (1e-4,),
        znear: float = 0.1,
        zfar: float = 100.0,
        bg_col: Optional[jnp.ndarray] = None,
        **kwargs,
    ) -> jnp.ndarray:
        cameras = kwargs.get("cameras", self.rasterizer.cameras)
        images = []
        N = len(point_clouds)
        rs = self.rasterizer.raster_settings
        for i in range(N):
            n = int(point_clouds.num_points_per_cloud()[i])
            pts = point_clouds.points_padded()[i][:n]
            feats = point_clouds.features_padded()
            cols = (
                feats[i][:n]
                if feats is not None
                else jnp.ones((n, 3), pts.dtype)
            )
            radius = rs.radius
            rad = (
                jnp.full((n,), float(radius))
                if isinstance(radius, (int, float))
                else jnp.asarray(radius)[:n]
            )
            cam_i = cameras if N == 1 else None
            cam_params = self._extract_cam_params(
                cam_i if cam_i is not None else cameras, znear
            )
            images.append(
                self.renderer(
                    pts,
                    cols,
                    rad,
                    cam_params,
                    gamma[min(i, len(gamma) - 1)],
                    max_depth=zfar,
                    min_depth=znear,
                    bg_col=bg_col,
                )
            )
        return jnp.stack(images)
