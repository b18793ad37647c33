"""Camera manipulation helpers.

Parity: reference renderer/camera_utils.py (`camera_to_eye_at_up` :17,
`rotate_on_spot` :75, `join_cameras_as_batch` :150).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def camera_to_eye_at_up(world_to_view_transform) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Invert look_at_view_transform: recover (eye, at, up) (reference :17)."""
    cam_trans = world_to_view_transform.inverse()
    # camera origin, a point in front (0,0,1), a point above (0,1,0)
    pts = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]], jnp.float32
    )[None]
    eye_at_up_world = cam_trans.transform_points(pts)  # (N, 3, 3)
    eye = eye_at_up_world[:, 0]
    at = eye_at_up_world[:, 1]
    up = eye_at_up_world[:, 2] - eye
    return eye, at, up


def rotate_on_spot(
    R: jnp.ndarray, T: jnp.ndarray, rotation: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate the camera in place by `rotation` (reference :75).

    R (N, 3, 3), T (N, 3), rotation (N, 3, 3) or (3, 3).
    """
    if R.ndim == 2:
        R = R[None]
    if T.ndim == 1:
        T = T[None]
    if rotation.ndim == 2:
        rotation = rotation[None]
    # reference math (camera_utils.py:138-141)
    new_R = R @ jnp.swapaxes(rotation, 1, 2)
    old_RT = jnp.einsum("nij,nj->ni", R, T)
    new_T = jnp.einsum("nji,nj->ni", new_R, old_RT)
    return new_R, new_T


def join_cameras_as_batch(cameras_list):
    """Concatenate same-type camera batches (reference :150)."""
    cam0 = cameras_list[0]
    for cam in cameras_list[1:]:
        if type(cam) is not type(cam0):
            raise ValueError("Cameras objects must be of the same type.")
    import jax

    def cat(*xs):
        if any(x is None for x in xs):
            return None
        return jnp.concatenate([jnp.asarray(x) for x in xs], axis=0)

    return jax.tree_util.tree_map(
        lambda *xs: cat(*xs), *cameras_list
    )
