"""Point cloud helpers: RGBD unprojection + point rendering.

Parity: reference implicitron/tools/point_cloud_utils.py
(`get_rgbd_point_cloud`, `render_point_cloud_pytorch3d`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ...renderer import (
    AlphaCompositor,
    PointsRasterizationSettings,
    PointsRasterizer,
    PointsRenderer,
)
from ...structures.pointclouds import Pointclouds


def get_rgbd_point_cloud(
    camera,
    image_rgb: jnp.ndarray,  # (N, H, W, 3)
    depth_map: jnp.ndarray,  # (N, H, W, 1)
    mask: Optional[jnp.ndarray] = None,  # (N, H, W, 1)
    mask_thr: float = 0.5,
) -> Pointclouds:
    """Unproject masked RGBD frames into a single point cloud (reference)."""
    N, H, W, _ = image_rgb.shape
    ys, xs = jnp.meshgrid(
        jnp.linspace(1.0, -1.0, H), jnp.linspace(1.0, -1.0, W), indexing="ij"
    )
    xy = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
    pts, feats = [], []
    for i in range(N):
        # index the camera batch per frame (a batched unproject would
        # broadcast every camera against every frame's depths)
        cam_i = camera
        if hasattr(camera, "__getitem__") and camera.R.shape[0] == N:
            cam_i = camera[i]
        d = depth_map[i, ..., 0].reshape(-1)
        xyd = jnp.concatenate([xy, d[:, None]], axis=-1)[None]
        world = cam_i.unproject_points(xyd)[0]
        keep = d > 0
        if mask is not None:
            keep = keep & (mask[i, ..., 0].reshape(-1) > mask_thr)
        # static-shape masking: zero-out dropped points' features
        world = jnp.where(keep[:, None], world, 0.0)
        color = jnp.where(
            keep[:, None], image_rgb[i].reshape(-1, 3), 0.0
        )
        pts.append(world)
        feats.append(color)
    return Pointclouds.create(
        jnp.concatenate(pts)[None], features=jnp.concatenate(feats)[None]
    )


def render_point_cloud_pytorch3d(
    camera,
    point_cloud: Pointclouds,
    render_size: Tuple[int, int] = (256, 256),
    point_radius: float = 0.03,
    topk: int = 10,
    bg_color=(0.0, 0.0, 0.0),
    **kwargs,
):
    """Render a point cloud into (image (N,H,W,C), mask) (reference)."""
    renderer = PointsRenderer(
        PointsRasterizer(
            camera,
            PointsRasterizationSettings(
                image_size=render_size, radius=point_radius,
                points_per_pixel=topk,
            ),
        ),
        AlphaCompositor(background_color=bg_color),
    )
    images = renderer(point_cloud)
    rasterizer = renderer.rasterizer
    frags = rasterizer(point_cloud)
    mask = (frags.idx[..., :1] >= 0).astype(images.dtype)
    return images, mask
