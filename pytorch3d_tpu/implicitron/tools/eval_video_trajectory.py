"""Generate smooth camera trajectories for evaluation videos.

Parity: reference implicitron/tools/eval_video_trajectory.py
(`generate_eval_video_cameras`: circular/figure-eight paths fit to the
train cameras).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...renderer import FoVPerspectiveCameras, look_at_view_transform
from .circle_fitting import fit_circle_in_3d


def generate_eval_video_cameras(
    train_cameras,
    n_eval_cams: int = 100,
    trajectory_type: str = "circular_lsq_fit",
    trajectory_scale: float = 1.1,
    scene_center=(0.0, 0.0, 0.0),
    up=(0.0, 1.0, 0.0),
    focal_length: Optional[jnp.ndarray] = None,
):
    """Fit a circular path to train camera centers and emit eval cameras."""
    centers = train_cameras.get_camera_center()  # (N, 3)
    angles = jnp.linspace(0, 2 * jnp.pi, n_eval_cams, endpoint=False)
    if trajectory_type in ("circular_lsq_fit", "simple_360"):
        circle = fit_circle_in_3d(
            centers, angles=angles, up=jnp.asarray(up, jnp.float32)
        )
        traj = circle.generated_points
        traj = (
            circle.center + (traj - circle.center) * trajectory_scale
        )
    else:
        raise ValueError(f"Unknown trajectory_type {trajectory_type}")

    center = jnp.asarray(scene_center, jnp.float32)
    Rs, Ts = [], []
    for i in range(n_eval_cams):
        R, T = look_at_view_transform(
            eye=traj[i : i + 1], at=center[None], up=jnp.asarray(up)[None]
        )
        Rs.append(R[0])
        Ts.append(T[0])
    return FoVPerspectiveCameras.create(
        R=jnp.stack(Rs), T=jnp.stack(Ts)
    )
