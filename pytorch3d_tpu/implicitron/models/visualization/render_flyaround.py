"""Render a trained model along a circular fly-around trajectory.

Parity: reference implicitron/models/visualization/render_flyaround.py
(`render_flyaround`): eval-camera trajectory -> rendered frames -> video.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ...models.renderer.base import EvaluationMode
from ...tools.eval_video_trajectory import generate_eval_video_cameras
from ...tools.video_writer import VideoWriter


def render_flyaround(
    dataset,
    sequence_name: Optional[str],
    model,
    params,
    output_video_path: str,
    n_flyaround_poses: int = 40,
    trajectory_type: str = "circular_lsq_fit",
    trajectory_scale: float = 1.1,
    fps: int = 20,
    visualize_preds_keys: Sequence[str] = ("images_render",),
    **kwargs,
) -> str:
    """Render `n_flyaround_poses` views and write a video; returns its path."""
    from ....renderer.camera_utils import join_cameras_as_batch

    cams = [
        dataset[i].camera
        for i in (
            dataset.sequence_indices_in_order(sequence_name)
            if sequence_name is not None
            else range(len(dataset))
        )
    ]
    train_cameras = join_cameras_as_batch(cams)
    traj = generate_eval_video_cameras(
        train_cameras,
        n_eval_cams=n_flyaround_poses,
        trajectory_type=trajectory_type,
        trajectory_scale=trajectory_scale,
    )

    os.makedirs(os.path.dirname(output_video_path) or ".", exist_ok=True)
    import jax

    writer = VideoWriter(fps=fps, out_path=output_video_path)
    for i in range(n_flyaround_poses):
        cam_i = jax.tree_util.tree_map(
            lambda x: x[i : i + 1]
            if hasattr(x, "ndim") and x.ndim > 0
            and x.shape[0] == n_flyaround_poses
            else x,
            traj,
        )
        preds = model.apply(
            params,
            camera=cam_i,
            evaluation_mode=EvaluationMode.EVALUATION,
        )
        frame = np.concatenate(
            [np.asarray(preds[k][0]) for k in visualize_preds_keys], axis=1
        )
        writer.write_frame(frame)
    return writer.get_video()
