"""Depth-map cleanup against a scene point cloud.

Parity: reference implicitron/tools/depth_cleanup.py:16
(`cleanup_eval_depth`): keeps only depth pixels whose rendered depth is
consistent (within sigma * std of the depth distribution) with the
scene point cloud projected into the camera.

TPU notes: the reference scatter_add over pixel indices becomes a
jnp .at[].add (XLA scatter); the nearest-neighbor grid_sample reuses
ops/grid_sample with the same -xy NDC flip.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.grid_sample import grid_sample
from ...ops.utils import wmean


def cleanup_eval_depth(
    point_cloud,
    camera,
    depth: jnp.ndarray,  # (B, 1, H, W)
    mask: jnp.ndarray,  # (B, 1, H, W)
    sigma: float = 0.01,
    image=None,
):
    """Returns a (B, 1, H, W) float mask of depth pixels consistent with
    `point_cloud` (reference depth_cleanup.py:16)."""
    ba, _, H, W = depth.shape

    pcl = point_cloud.points_padded()
    n_pts = point_cloud.num_points_per_cloud()
    pcl_mask = (
        jnp.arange(pcl.shape[1])[None] < n_pts[:, None]
    ).astype(pcl.dtype)

    pcl_proj = camera.transform_points(pcl, eps=1e-2)[..., :-1]
    pcl_depth = camera.get_world_to_view_transform().transform_points(pcl)[
        ..., -1
    ]

    idx_map = (
        jnp.arange(H * W, dtype=depth.dtype)
        .reshape(1, 1, H, W)
        .repeat(ba, axis=0)
    )
    depth_and_idx = jnp.concatenate([depth, idx_map], axis=1)  # (B, 2, H, W)

    # pytorch3d NDC +x left -> grid_sample -x (reference uses -pcl_proj)
    sampled = grid_sample(
        depth_and_idx, -pcl_proj[:, None], mode="nearest"
    )[:, :, 0]  # (B, 2, P)
    depth_sampled, idx_sampled = sampled[:, 0], sampled[:, 1]
    df = jnp.abs(depth_sampled - pcl_depth)

    mu = wmean(depth.reshape(ba, -1, 1), mask.reshape(ba, -1)).reshape(ba, 1)
    std = jnp.sqrt(
        jnp.clip(
            wmean(
                (depth.reshape(ba, -1) - mu).reshape(ba, -1, 1) ** 2,
                mask.reshape(ba, -1),
            ),
            1e-4,
        )
    ).reshape(ba, -1)
    good_df_thr = std * sigma
    good_depth = (df <= good_df_thr).astype(depth.dtype) * pcl_mask

    flat = jnp.zeros((ba, H * W), depth.dtype)
    rows = jnp.broadcast_to(jnp.arange(ba)[:, None], idx_sampled.shape)
    cols = jnp.round(idx_sampled).astype(jnp.int32)
    good_depth_raster = flat.at[rows, cols].add(good_depth)

    return (good_depth_raster.reshape(ba, 1, H, W) > 0).astype(depth.dtype)
