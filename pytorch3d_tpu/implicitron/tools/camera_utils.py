"""Camera helper tools for Implicitron.

Parity: reference implicitron/tools/camera_utils.py (`jitter_extrinsics`
:20, `apply_camera_alignment` :48, `get_min_max_depth_bounds` :74,
`volumetric_camera_overlaps` :93).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def jitter_extrinsics(
    R: jnp.ndarray,
    T: jnp.ndarray,
    max_angle: float = 2.0 * 3.141592653589793,
    translation_std: float = 1.0,
    scale_std: float = 0.3,
    key: Optional[jax.Array] = None,
):
    """Randomly jitter all cameras by one common similarity (reference :20)."""
    from ...transforms.rotation_conversions import axis_angle_to_matrix

    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.clip(jnp.linalg.norm(axis), 1e-8)
    angle = jax.random.uniform(k2, (), minval=-max_angle, maxval=max_angle)
    R_jit = axis_angle_to_matrix(axis * angle)
    T_jit = jax.random.normal(k3, (3,)) * translation_std
    scale = jnp.exp(jax.random.normal(k4, ()) * scale_std)
    new_R = jnp.einsum("ij,njk->nik", R_jit, R)
    new_T = (T + jnp.einsum("i,nij->nj", T_jit, R)) * scale
    return new_R, new_T, jnp.broadcast_to(scale, (R.shape[0],))


def apply_camera_alignment(R, T, R_align, T_align, s_align):
    """Apply a similarity (R_A, T_A, s_A) to camera extrinsics (reference :48)."""
    new_R = jnp.einsum("ij,njk->nik", R_align, R)
    new_T = jnp.einsum("i,nij->nj", T_align, R) + T * s_align
    return new_R, new_T


def get_min_max_depth_bounds(cameras, scene_center, scene_extent):
    """Depth range covering a sphere around scene_center (reference :74)."""
    center = jnp.asarray(scene_center)
    cam_center = cameras.get_camera_center()
    dist = jnp.linalg.norm(cam_center - center, axis=-1)
    d = jnp.mean(dist)
    return jnp.maximum(d - scene_extent, 1e-3), d + scene_extent


def volumetric_camera_overlaps(
    cameras,
    scene_extent: float = 8.0,
    scene_center: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    resol: int = 16,
    weigh_by_ray_angle: bool = True,
) -> jnp.ndarray:
    """(N, N) pairwise IoU of camera frusta over a scene volume
    (reference :93): sample a dense grid, project into each camera, count
    co-visible cells."""
    grid = jnp.stack(
        jnp.meshgrid(
            *[jnp.linspace(-scene_extent, scene_extent, resol)] * 3,
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3) + jnp.asarray(scene_center)
    N = cameras.R.shape[0]
    pts = jnp.broadcast_to(grid[None], (N, grid.shape[0], 3))
    proj = cameras.transform_points(pts, eps=1e-4)
    inside = (
        (jnp.abs(proj[..., 0]) <= 1.0)
        & (jnp.abs(proj[..., 1]) <= 1.0)
        & (proj[..., 2] > 0.0)
    ).astype(jnp.float32)  # (N, P)
    inter = inside @ inside.T
    union = (
        jnp.sum(inside, axis=1)[:, None]
        + jnp.sum(inside, axis=1)[None]
        - inter
    )
    return inter / jnp.clip(union, 1.0)
