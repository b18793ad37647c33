"""PulsarPointsRenderer: pulsar with the standard PyTorch3D camera/
Pointclouds interface.

Parity: reference renderer/points/pulsar/unified.py:37
(`PulsarPointsRenderer`): consumes FoVPerspective / FoVOrthographic /
Perspective / Orthographic cameras and Pointclouds, converts to the
pulsar 10-float cam_params layout
[pos(3), axis-angle(3), focal, sensor_width, ppx_px, ppy_px]
(unified.py:502), and renders each cloud.
"""

from __future__ import annotations

import math
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
        self._image_size = image_size
        cameras = rasterizer.cameras
        orthogonal = (
            cameras is not None and not cameras.is_perspective()
        )
        self.renderer = Renderer(
            width=image_size[1],
            height=image_size[0],
            max_num_balls=max_num_spheres,
            orthogonal_projection=orthogonal,
            n_channels=n_channels,
        )

    # ------------------------------------------------------------------ #

    def _extract_extrinsics(self, cameras, idx: int):
        """PyTorch3D (R, T) -> pulsar-native camera pose.

        PyTorch3D view coords are (+x left, +y up, +z forward); the
        pulsar core is (+x right, ...).  A lone x flip is improper
        (det -1), so — exactly like the reference's
        PyTorch3D->OpenCV->pulsar chain (camera_conversions.py:101) —
        we flip BOTH x and y (a proper rotation, view y now DOWN) and
        compensate by flipping the rendered image vertically in
        __call__ (reference unified.py renders upside-down through
        this conversion and unflips at the end)."""
        D = jnp.asarray([-1.0, -1.0, 1.0], jnp.float32)
        R = cameras.R[idx] * D[None, :]  # (3, 3) row-vector world->view
        T = cameras.T[idx] * D
        C = -(T @ jnp.swapaxes(R, 0, 1))  # camera center (flip-invariant)
        axis_angle = matrix_to_axis_angle(R)
        return C, axis_angle

    def _extract_intrinsics(self, cameras, idx: int, znear, zfar):
        """(focal, sensor_width, ppx_px, ppy_px) per the reference's
        conversion (unified.py:179)."""
        H, W = self._image_size
        ppx = ppy = 0.0
        if hasattr(cameras, "fov"):  # FoVPerspectiveCameras
            fov = jnp.asarray(cameras.fov).reshape(-1)[
                min(idx, jnp.asarray(cameras.fov).reshape(-1).shape[0] - 1)
            ]
            if getattr(cameras, "degrees", True):
                fov = fov * math.pi / 180.0
            focal = znear - 1e-6
            sensor = jnp.tan(fov / 2.0) * 2.0 * focal
        elif hasattr(cameras, "max_x"):  # FoVOrthographicCameras
            max_x = float(jnp.asarray(cameras.max_x).reshape(-1)[0])
            min_x = float(jnp.asarray(cameras.min_x).reshape(-1)[0])
            focal = 0.0
            sensor = max_x - min_x
        else:  # Perspective / Orthographic (NDC focal_length convention)
            fl = jnp.asarray(cameras.focal_length)
            fl = fl.reshape(-1, fl.shape[-1]) if fl.ndim > 1 else fl.reshape(1, -1)
            f = fl[min(idx, fl.shape[0] - 1), 0]
            if cameras.is_perspective():
                focal = znear - 1e-6
                sensor = focal / f * 2.0
            else:
                focal = 0.0
                sensor = 2.0 / f
            pp = getattr(cameras, "principal_point", None)
            if pp is not None:
                # pulsar-native pixel offsets: negated because the
                # extrinsic conversion flipped view x and y (the core
                # adds these offsets in ITS convention; reference
                # camera_conversions.py:186 cx = -(cx - w/2))
                if not cameras.in_ndc():
                    # reference: "Pulsar not currently working in screen
                    # space" (tests/test_camera_pixels.py:154)
                    raise ValueError(
                        "PulsarPointsRenderer requires NDC-space cameras."
                    )
                pp = jnp.asarray(pp).reshape(-1, 2)
                ppx = -float(pp[min(idx, pp.shape[0] - 1), 0]) * 0.5 * W
                ppy = -float(pp[min(idx, pp.shape[0] - 1), 1]) * 0.5 * H
        return focal, sensor, ppx, ppy

    def _cam_params(self, cameras, idx: int, znear, zfar):
        C, axis_angle = self._extract_extrinsics(cameras, idx)
        focal, sensor, ppx, ppy = self._extract_intrinsics(
            cameras, idx, znear, zfar
        )
        return jnp.concatenate(
            [
                C,
                axis_angle,
                jnp.asarray(
                    [focal, sensor, ppx, ppy], jnp.float32
                ).reshape(-1),
            ]
        )

    def __call__(
        self,
        point_clouds,
        gamma: Tuple[float, ...] = (1e-4,),
        znear=(0.1,),
        zfar=(100.0,),
        bg_col: Optional[jnp.ndarray] = None,
        **kwargs,
    ) -> jnp.ndarray:
        cameras = kwargs.get("cameras", self.rasterizer.cameras)
        if isinstance(znear, (int, float)):
            znear = (float(znear),)
        if isinstance(zfar, (int, float)):
            zfar = (float(zfar),)
        images = []
        N = len(point_clouds)
        rs = self.rasterizer.raster_settings
        n_cams = cameras.R.shape[0]
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
            zn = znear[min(i, len(znear) - 1)]
            zf = zfar[min(i, len(zfar) - 1)]
            cam_params = self._cam_params(
                cameras, min(i, n_cams - 1), zn, zf
            )
            img = self.renderer(
                pts,
                cols,
                rad,
                cam_params,
                gamma[min(i, len(gamma) - 1)],
                max_depth=zf,
                min_depth=zn,
                bg_col=bg_col,
                mode=kwargs.get("mode", 0),
            )
            # the extrinsic conversion renders with view y DOWN (see
            # _extract_extrinsics): unflip vertically, like reference
            # unified.py does after its OpenCV-convention render
            images.append(img[::-1])
        return jnp.stack(images)
