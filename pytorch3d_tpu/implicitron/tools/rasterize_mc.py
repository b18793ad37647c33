"""Rasterize Monte-Carlo-sampled colored points to an image.

Parity: reference implicitron/tools/rasterize_mc.py
(`rasterize_sparse_ray_bundle` :22, `rasterize_mc_samples` :104): renders a
z-flat point cloud of the MC xy sample locations through the point
rasterizer with a finite splat radius (on TPU that is our Pallas point
rasterizer), exactly like the reference — not a nearest-pixel scatter.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...renderer.cameras import PerspectiveCameras
from ...structures.pointclouds import Pointclouds
from .point_cloud_utils import render_point_cloud_pytorch3d


def rasterize_mc_samples(
    xys: jnp.ndarray,  # (B, P, 2) NDC sample locations
    feats: jnp.ndarray,  # (B, P, C)
    image_size_hw: Tuple[int, int],
    radius: float = 0.03,
    topk: int = 5,
    masks: Optional[jnp.ndarray] = None,  # (B, P, 1)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splat sparse samples into (B, H, W, C) + render mask (B, H, W, 1).

    Renders a z=1 flat point cloud through the point rasterizer with the
    given splat radius (reference rasterize_mc.py:104-151).
    """
    B, P, C = feats.shape
    if masks is None:
        masks = jnp.ones((B, P, 1), feats.dtype)

    # append the alpha mask as a feature channel so it is splatted alongside
    feats_m = jnp.concatenate([feats, masks.astype(feats.dtype)], axis=-1)
    points = jnp.concatenate([xys, jnp.ones_like(xys[..., :1])], axis=-1)
    pcl = Pointclouds.create(points, features=feats_m)

    cameras = PerspectiveCameras.create(
        R=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        T=jnp.zeros((B, 3)),
    )
    data, render_mask = render_point_cloud_pytorch3d(
        cameras,
        pcl,
        render_size=image_size_hw,
        point_radius=radius,
        topk=topk,
        bg_color=(0.0,) * int(feats_m.shape[-1]),
    )  # (B, H, W, C+1), (B, H, W, 1)
    images = data[..., :C]
    mask_splat = data[..., C:]
    return images, mask_splat * render_mask


def rasterize_sparse_ray_bundle(
    ray_bundle,
    features: jnp.ndarray,  # (B, ..., C)
    image_size_hw: Tuple[int, int],
    depth: Optional[jnp.ndarray] = None,  # (B, ..., 1)
    masks: Optional[jnp.ndarray] = None,  # (B, ..., 1)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rasterize ray-bundle samples into (images, depths, masks) renders
    (reference rasterize_mc.py:22-101).

    Handles packed (heterogeneous) bundles with `camera_ids`/`camera_counts`
    by regrouping rays per source camera on the host — this is a
    visualization tool, so dynamic host-side shapes are fine.
    """
    B = features.shape[0]
    C = features.shape[-1]
    feats = features.reshape(B, -1, C)
    if depth is None:
        depth = jnp.zeros(feats.shape[:-1] + (1,), feats.dtype)
    fd = jnp.concatenate([feats, depth.reshape(B, -1, 1)], axis=-1)
    xys = ray_bundle.xys.reshape(B, -1, 2)
    masks_ras = None if masks is None else masks.reshape(B, -1, 1)

    camera_counts = getattr(ray_bundle, "camera_counts", None)
    if camera_counts is not None:
        # packed: one ray per row; regroup rows per source camera and pad
        ids = np.asarray(ray_bundle.camera_ids).reshape(-1)
        counts = np.asarray(camera_counts)
        n_cam = counts.shape[0]
        max_c = max(int(counts.max()), 1)
        fd_np = np.asarray(fd.reshape(-1, C + 1))
        xys_np = np.asarray(xys.reshape(-1, 2))
        m_np = (
            np.asarray(masks_ras.reshape(-1, 1))
            if masks_ras is not None
            else np.ones((ids.shape[0], 1), np.float32)
        )
        fd_p = np.zeros((n_cam, max_c, C + 1), np.float32)
        xy_p = np.zeros((n_cam, max_c, 2), np.float32)
        m_p = np.zeros((n_cam, max_c, 1), np.float32)
        for ci in range(n_cam):
            sel = ids == ci
            k = int(sel.sum())
            fd_p[ci, :k] = fd_np[sel]
            xy_p[ci, :k] = xys_np[sel]
            m_p[ci, :k] = m_np[sel]
        fd, xys, masks_ras = jnp.asarray(fd_p), jnp.asarray(xy_p), jnp.asarray(m_p)

    # radius that approximately covers the image with the available samples
    pt_radius = 2.0 / math.sqrt(xys.shape[1])
    rendered, mask_render = rasterize_mc_samples(
        xys, fd, image_size_hw, radius=pt_radius, masks=masks_ras
    )
    images = rendered[..., :-1]
    depths = rendered[..., -1:]
    return images, depths, mask_render
