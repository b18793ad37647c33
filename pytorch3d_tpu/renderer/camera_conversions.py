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


def pulsar_from_opencv_projection(
    R: jnp.ndarray,  # (N, 3, 3)
    tvec: jnp.ndarray,  # (N, 3) or (N, 3, 1)
    camera_matrix: jnp.ndarray,  # (N, 3, 3)
    image_size: jnp.ndarray,  # (N, 2) (height, width)
    znear: float = 0.1,
) -> jnp.ndarray:
    """OpenCV camera parameters -> pulsar 13-float camera vectors
    (reference renderer/camera_conversions.py:101 via
    utils/camera_conversions.py:98).

    Layout: 3 cam position, 6 rotation (6d), focal_length, sensor_width,
    c_x, c_y.  Pulsar supports one focal length only: fx/fy are averaged
    (the reference warns above 1% disagreement).  The rendered image is
    vertically flipped relative to OpenCV, as in the reference.
    """
    from ..transforms import matrix_to_rotation_6d

    R = jnp.asarray(R, jnp.float32)
    tvec = jnp.asarray(tvec, jnp.float32)
    if tvec.ndim == 2:
        tvec = tvec[..., None]  # (N, 3, 1)
    camera_matrix = jnp.asarray(camera_matrix, jnp.float32)
    image_size_wh = jnp.asarray(image_size, jnp.float32)[:, ::-1]
    N = R.shape[0]

    fx = camera_matrix[:, 0, 0][:, None]
    fy = camera_matrix[:, 1, 1][:, None]
    f = (fx + fy) / 2.0
    image_w = image_size_wh[0, 0]
    image_h = image_size_wh[0, 1]
    focal_length_px = f / image_w
    focal_length = jnp.full((N, 1), znear - 1e-5, jnp.float32)
    sensor_width = focal_length / focal_length_px
    cx = camera_matrix[:, 0, 2][:, None]
    cy = camera_matrix[:, 1, 2][:, None]
    cx = -(cx - image_w / 2.0)
    cy = cy - image_h / 2.0
    param = jnp.concatenate([focal_length, sensor_width, cx, cy], axis=1)
    R_trans = jnp.swapaxes(R, 1, 2)
    cam_pos = -jnp.einsum("nij,njk->nik", R_trans, tvec)[..., 0]
    cam_rot = matrix_to_rotation_6d(R_trans)
    return jnp.concatenate([cam_pos, cam_rot, param], axis=1)


def pulsar_from_cameras_projection(
    cameras, image_size: jnp.ndarray
) -> jnp.ndarray:
    """PyTorch3D PerspectiveCameras -> pulsar 13-float camera vectors
    (reference renderer/camera_conversions.py:197)."""
    R_cv, T_cv, K_cv = opencv_from_cameras_projection(cameras, image_size)
    return pulsar_from_opencv_projection(R_cv, T_cv, K_cv, image_size)
