"""View and regularization metrics.

Parity: reference implicitron/models/metrics.py (`ViewMetrics` :135,
`RegularizationMetrics` :100; eikonal :393, TV :397, depth-neg :414).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..tools.config import ReplaceableBase, registry
from ...renderer.utils import ndc_grid_sample, ndc_grid_sample_packed


def _huber(dfsq: jnp.ndarray, scaling: float = 0.03) -> jnp.ndarray:
    """Huber on squared differences (reference metrics.py:430)."""
    loss = (safe_sqrt(dfsq, eps=1e-4) - scaling) * scaling
    return jnp.where(dfsq <= scaling**2, 0.5 * dfsq, loss + 0.5 * scaling**2)


def safe_sqrt(x, eps=1e-4):
    ok = x > eps * eps
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), eps)


def _avg(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    w = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(x * w) / jnp.clip(jnp.sum(w), 1.0)


class ViewMetricsBase(ReplaceableBase):
    pass


class RegularizationMetricsBase(ReplaceableBase):
    pass


@registry.register
@dataclasses.dataclass
class ViewMetrics(ViewMetricsBase):
    """Pixel-space losses between rendered and GT images (reference :135).

    All images are channels-last (N, ..., C) sampled at ray xys.
    """

    def __call__(
        self,
        results: Dict[str, Any],
        raymarched,
        image_rgb: Optional[jnp.ndarray] = None,  # (N, H, W, 3) GT
        depth_map: Optional[jnp.ndarray] = None,
        fg_probability: Optional[jnp.ndarray] = None,
        xys: Optional[jnp.ndarray] = None,  # (N, ..., 2) ray NDC locations
        camera_ids: Optional[jnp.ndarray] = None,  # (R,) for packed bundles
        keys_prefix: str = "loss_",
        **kwargs,
    ) -> Dict[str, Any]:
        metrics = {}

        def sample(img, mode="bilinear"):
            if img is None or xys is None:
                return None
            chan = jnp.moveaxis(img, -1, 1)  # (N, C, H, W)
            if camera_ids is not None:
                # heterogeneous bundle: xys is (R, spatial..., 2) with one
                # source image per ray (reference metrics.py:268 sample_packed)
                spatial = xys.shape[:-1]
                ids = jnp.broadcast_to(
                    camera_ids.reshape((-1,) + (1,) * (len(spatial) - 1)),
                    spatial,
                ).reshape(-1)
                out = ndc_grid_sample_packed(
                    chan, xys.reshape(-1, 2), ids, mode=mode
                )  # (R, C)
                return out.reshape(spatial + (chan.shape[1],))
            out = ndc_grid_sample(chan, xys, mode=mode)  # (N, C, ...)
            return jnp.moveaxis(out, 1, -1)

        # rgb bilinear; masks/depth nearest (reference metrics.py:284-287)
        gt_rgb = sample(image_rgb)
        gt_mask = (
            sample(fg_probability, "nearest")
            if fg_probability is not None
            else None
        )
        gt_depth = sample(depth_map, "nearest") if depth_map is not None else None

        pred_rgb = raymarched.features
        pred_mask = raymarched.masks
        pred_depth = raymarched.depths

        if gt_rgb is not None:
            df = pred_rgb - gt_rgb
            mse = jnp.mean(df * df)
            metrics[keys_prefix + "rgb_mse"] = mse
            metrics[keys_prefix + "rgb_huber"] = jnp.mean(
                _huber(jnp.sum(df * df, axis=-1, keepdims=True))
            )
            metrics[keys_prefix + "rgb_psnr"] = -10.0 * jnp.log10(
                jnp.clip(mse, 1e-12)
            )
            if gt_mask is not None:
                metrics[keys_prefix + "rgb_mse_fg"] = _avg(df * df, gt_mask)
                metrics[keys_prefix + "rgb_psnr_fg"] = -10.0 * jnp.log10(
                    jnp.clip(_avg(df * df, gt_mask), 1e-12)
                )
        if gt_mask is not None and pred_mask is not None:
            m = jnp.clip(pred_mask, 1e-6, 1.0 - 1e-6)
            bce = -(
                gt_mask * jnp.log(m) + (1.0 - gt_mask) * jnp.log(1.0 - m)
            )
            metrics[keys_prefix + "mask_bce"] = jnp.mean(bce)
            inter = jnp.sum(jnp.minimum(pred_mask, gt_mask))
            union = jnp.sum(jnp.maximum(pred_mask, gt_mask))
            metrics[keys_prefix + "mask_neg_iou"] = -(inter / jnp.clip(union, 1e-6))
        if gt_depth is not None and pred_depth is not None:
            dfd = pred_depth - gt_depth
            valid = (gt_depth > 0).astype(dfd.dtype)
            metrics[keys_prefix + "depth_abs"] = _avg(jnp.abs(dfd), valid)
            if gt_mask is not None:
                metrics[keys_prefix + "depth_abs_fg"] = _avg(
                    jnp.abs(dfd), valid * gt_mask
                )
        results.update(metrics)
        return results


@registry.register
@dataclasses.dataclass
class RegularizationMetrics(RegularizationMetricsBase):
    """Model regularizers (reference :100): eikonal, TV, depth negative."""

    def __call__(
        self, results: Dict[str, Any], model=None, keys_prefix: str = "loss_",
        raymarched=None, **kwargs,
    ) -> Dict[str, Any]:
        if raymarched is not None and raymarched.depths is not None:
            results[keys_prefix + "depth_neg_penalty"] = jnp.mean(
                jnp.minimum(raymarched.depths, 0.0) ** 2
            )
        # eikonal regularizer ||grad sdf| - 1|^2 over the SDF renderer's
        # sample set (reference base_model.py loss_eikonal; grad_theta is
        # produced by SignedDistanceFunctionRenderer in TRAINING mode)
        grad_theta = (
            raymarched.aux.get("grad_theta")
            if raymarched is not None and raymarched.aux
            else None
        )
        if grad_theta is not None:
            norms = jnp.sqrt(
                jnp.sum(grad_theta**2, axis=-1) + 1e-12
            )
            results[keys_prefix + "eikonal"] = jnp.mean((norms - 1.0) ** 2)
        return results
