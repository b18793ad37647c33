"""Project 3D points into source views and sample features.

Parity: reference implicitron/models/view_pooler/view_sampler.py
(`ViewSampler`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from ....renderer.utils import ndc_grid_sample
from ...tools.config import Configurable


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
