"""OpenCV <-> PyTorch3D camera conversions.

Parity: reference renderer/camera_conversions.py:21-197 /
utils/camera_conversions.py:22.

OpenCV convention: x_screen ~ K [R_cv | t_cv] X_world (column vectors,
+X right, +Y down, +Z into screen).  Ours: row vectors, +X left, +Y up,
view z positive (cameras.py:39-59 conventions).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .cameras import PerspectiveCameras


def cameras_from_opencv_projection(
    R: jnp.ndarray,  # (N, 3, 3) OpenCV rotation
    tvec: jnp.ndarray,  # (N, 3)
    camera_matrix: jnp.ndarray,  # (N, 3, 3)
    image_size: jnp.ndarray,  # (N, 2) (h, w)
) -> PerspectiveCameras:
    """OpenCV (R, t, K) -> PerspectiveCameras (reference :21)."""
    focal_length = jnp.stack(
        [camera_matrix[:, 0, 0], camera_matrix[:, 1, 1]], axis=-1
    )
    principal_point = camera_matrix[:, :2, 2]

    # screen -> NDC (reference flips sign and scales by half-size)
    image_size_wh = image_size[:, ::-1].astype(jnp.float32)
    scale = jnp.min(image_size_wh, axis=1, keepdims=True) / 2.0
    c0 = image_size_wh / 2.0
    p0_ndc = -(principal_point - c0) / scale
    f_ndc = focal_length / scale

    # rotation: flip x, y axes (OpenCV +x right/+y down vs ours +x left/+y up)
    R_pytorch3d = jnp.swapaxes(R, 1, 2).at[:, :, :2].multiply(-1.0)
    T_pytorch3d = tvec.at[:, :2].multiply(-1.0)
    return PerspectiveCameras.create(
        R=R_pytorch3d,
        T=T_pytorch3d,
        focal_length=f_ndc,
        principal_point=p0_ndc,
    )


def opencv_from_cameras_projection(
    cameras: PerspectiveCameras,
    image_size: jnp.ndarray,  # (N, 2) (h, w)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PerspectiveCameras -> OpenCV (R, tvec, camera_matrix) (reference :97)."""
    R_pytorch3d = cameras.R
    T_pytorch3d = cameras.T
    focal = jnp.asarray(cameras.focal_length)
    if focal.ndim == 1:
        focal = jnp.stack([focal, focal], axis=-1)
    p0 = jnp.asarray(cameras.principal_point)

    T_cv = T_pytorch3d.at[:, :2].multiply(-1.0)
    R_cv = jnp.swapaxes(R_pytorch3d.at[:, :, :2].multiply(-1.0), 1, 2)

    image_size_wh = image_size[:, ::-1].astype(jnp.float32)
    scale = jnp.min(image_size_wh, axis=1, keepdims=True) / 2.0
    c0 = image_size_wh / 2.0
    principal_point = -p0 * scale + c0
    focal_length = focal * scale

    N = R_cv.shape[0]
    camera_matrix = jnp.zeros((N, 3, 3))
    camera_matrix = camera_matrix.at[:, 0, 0].set(focal_length[:, 0])
    camera_matrix = camera_matrix.at[:, 1, 1].set(focal_length[:, 1])
    camera_matrix = camera_matrix.at[:, 0, 2].set(principal_point[:, 0])
    camera_matrix = camera_matrix.at[:, 1, 2].set(principal_point[:, 1])
    camera_matrix = camera_matrix.at[:, 2, 2].set(1.0)
    return R_cv, T_cv, camera_matrix
