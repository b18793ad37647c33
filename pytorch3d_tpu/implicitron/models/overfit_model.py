"""OverfitModel: single-scene NeRF-style model.

Parity: reference implicitron/models/overfit_model.py (`OverfitModel`, a
GenericModel specialization for single-scene overfitting with optional
coarse implicit function).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..tools.config import registry
from .base_model import ImplicitronModelBase, ImplicitronRender
from .generic_model import GenericModel


@registry.register
class OverfitModel(GenericModel):
    """Single-scene variant of GenericModel (reference overfit_model.py).

    On TPU the only difference from GenericModel is default configuration:
    no view pooling / global encoding, a coarse+fine pass pair, and MC ray
    sampling from one scene; the pipeline is otherwise identical, so this
    subclass just pins those defaults.
    """

    num_passes: int = 2
    chunk_size_grid: int = 4096


@registry.register
class ModelDBIR(nn.Module, ImplicitronModelBase):
    """Depth-based image re-rendering baseline (reference model_dbir.py:153).

    Unprojects source RGBD frames into a point cloud and re-renders it into
    the target view with the point rasterizer.
    """

    render_image_width: int = 256
    render_image_height: int = 256
    bg_color: float = 0.0
    max_points: int = 100000

    def __call__(
        self,
        *,
        camera,
        image_rgb: jnp.ndarray,  # (N, H, W, 3) source images
        depth_map: jnp.ndarray,  # (N, H, W, 1)
        fg_probability: Optional[jnp.ndarray] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        from ...renderer import (
            AlphaCompositor,
            PointsRasterizationSettings,
            PointsRasterizer,
            PointsRenderer,
        )
        from ...structures.pointclouds import Pointclouds

        N, H, W, _ = image_rgb.shape
        # unproject source pixels with depth into world space, at NDC pixel
        # CENTERS (1 - (2i+1)/n) so the re-rendered splats land back on the
        # rasterizer's pixel centers
        ys, xs = jnp.meshgrid(
            jnp.linspace(1 - 1 / H, -1 + 1 / H, H),
            jnp.linspace(1 - 1 / W, -1 + 1 / W, W),
            indexing="ij",
        )
        xy = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
        pts_all = []
        feats_all = []
        for i in range(N):
            depth = depth_map[i, ..., 0].reshape(-1)
            xyd = jnp.concatenate([xy, depth[:, None]], axis=-1)[None]
            world = camera[i].unproject_points(xyd) if hasattr(camera, "__getitem__") else camera.unproject_points(xyd)
            pts_all.append(world[0])
            feats_all.append(image_rgb[i].reshape(-1, 3))
        pts = jnp.concatenate(pts_all, axis=0)[None]
        feats = jnp.concatenate(feats_all, axis=0)[None]

        pc = Pointclouds.create(pts, features=feats)
        if self.max_points > 0 and pc.points_padded().shape[1] > self.max_points:
            pc = pc.subsample(self.max_points, key=jax.random.PRNGKey(0))
        target_cam = kwargs.get("target_camera")
        if target_cam is None:
            # reference model_dbir.py renders into the (first) target view
            target_cam = camera[0] if hasattr(camera, "__getitem__") else camera
        rasterizer = PointsRasterizer(
            target_cam,
            PointsRasterizationSettings(
                image_size=(self.render_image_height, self.render_image_width),
                radius=0.01,
                points_per_pixel=4,
            ),
        )
        frags = rasterizer(pc)
        compositor = AlphaCompositor(background_color=(self.bg_color,) * 3)
        images = compositor(
            frags.idx, frags.alpha_weights(), pc.features_packed()
        ) if hasattr(frags, "alpha_weights") else PointsRenderer(
            rasterizer, compositor
        )(pc)
        mask_render = (frags.idx[..., :1] >= 0).astype(images.dtype)
        zb = frags.zbuf[..., :1]
        depth_render = jnp.where(zb > 0, zb, 0.0)
        render = ImplicitronRender(
            image_render=images,
            mask_render=mask_render,
            depth_render=depth_render,
        )
        return {
            "implicitron_render": render,
            "images_render": images,
            "masks_render": mask_render,
            "depths_render": depth_render,
            "point_cloud": pc,
        }
