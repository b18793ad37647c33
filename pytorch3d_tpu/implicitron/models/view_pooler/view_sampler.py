"""Project 3D points into source views and sample features.

Parity: reference implicitron/models/view_pooler/view_sampler.py
(`ViewSampler` :19, `project_points_and_sample` :102, `handle_seq_id`
:191, `cameras_points_cartesian_product` :216).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ....renderer.utils import ndc_grid_sample
from ...tools.config import Configurable


def handle_seq_id(seq_id, device=None) -> jnp.ndarray:
    """Convert a sequence of sequence ids (strings / ints / array) to an
    int array (reference view_sampler.py:191); strings hash stably via
    crc32."""
    import zlib

    if isinstance(seq_id, jnp.ndarray) or isinstance(seq_id, np.ndarray):
        return jnp.asarray(seq_id, jnp.int64)
    if len(seq_id) > 0 and isinstance(seq_id[0], str):
        seq_id = [zlib.crc32(s.encode("utf8")) for s in seq_id]
    return jnp.asarray(list(seq_id), jnp.int64)


def cameras_points_cartesian_product(camera, pts: jnp.ndarray):
    """All (camera, point-batch) pairs: cameras repeated point-batch
    times each, points tiled camera-batch times (reference
    view_sampler.py:216)."""
    n_cameras = camera.R.shape[0]
    pts_batch = pts.shape[0]
    idx = jnp.repeat(jnp.arange(n_cameras), pts_batch)
    camera_rep = camera[idx]
    pts_rep = jnp.tile(pts, (n_cameras,) + (1,) * (pts.ndim - 1))
    return camera_rep, pts_rep


def project_points_and_sample(
    pts: jnp.ndarray,  # (pts_batch, n_pts, 3)
    feats: Dict[str, jnp.ndarray],  # name -> (n_cameras, C, H, W)
    camera,
    masks: Optional[jnp.ndarray],  # (n_cameras, 1, H, W) | None
    eps: float = 1e-2,
    sampling_mode: str = "bilinear",
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Project every point batch into every camera and sample features
    at the projections (reference view_sampler.py:102). Returns
    ({name: (pts_batch, n_cameras, n_pts, C)},
    (pts_batch, n_cameras, n_pts, 1))."""
    n_cameras = camera.R.shape[0]
    pts_batch = pts.shape[0]
    n_pts = pts.shape[1:-1]

    camera_rep, pts_rep = cameras_points_cartesian_product(camera, pts)
    proj_rep = camera_rep.transform_points(
        pts_rep.reshape(n_cameras * pts_batch, -1, 3), eps=eps
    )[..., :2]
    grid = proj_rep.reshape(n_cameras, pts_batch, -1, 2)

    def sample(f):
        s = ndc_grid_sample(f, grid, mode=sampling_mode)  # (V, C, B, P)
        return jnp.moveaxis(s, 1, -1).swapaxes(0, 1).reshape(
            (pts_batch, n_cameras) + n_pts + (-1,)
        )

    feats_sampled = {k: sample(f) for k, f in feats.items()}
    if masks is not None:
        masks_sampled = sample(masks)
    else:
        masks_sampled = jnp.ones(
            (pts_batch, n_cameras) + n_pts + (1,), pts.dtype
        )
    return feats_sampled, masks_sampled


@dataclasses.dataclass
class ViewSampler(Configurable):
    masked_sampling: bool = False
    sampling_mode: str = "bilinear"

    def __call__(
        self,
        pts: jnp.ndarray,  # (B, P, 3) world points
        seq_id_pts,
        camera,  # source-view cameras (batch of V)
        seq_id_camera,
        feats: Dict[str, jnp.ndarray],  # name -> (V, C, H, W)
        masks: jnp.ndarray,  # (V, 1, H, W) | None
        **kwargs,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Returns (sampled feats name -> (V, P, C), sample masks (V, P, 1))."""
        V = camera.R.shape[0]
        P = pts.shape[-2]
        pts_flat = jnp.broadcast_to(
            pts.reshape(1, -1, 3), (V, pts.reshape(-1, 3).shape[0], 3)
        )
        # project into each source view (NDC xy)
        proj = camera.transform_points(pts_flat, eps=1e-4)[..., :2]
        sampled = {}
        for name, f in feats.items():
            s = ndc_grid_sample(f, proj, mode=self.sampling_mode)
            sampled[name] = jnp.moveaxis(s, 1, -1)  # (V, P, C)
        if masks is not None:
            m = ndc_grid_sample(masks, proj, mode=self.sampling_mode)
            sample_masks = jnp.moveaxis(m, 1, -1)
        else:
            sample_masks = jnp.ones(proj.shape[:-1] + (1,), pts.dtype)
        return sampled, sample_masks
