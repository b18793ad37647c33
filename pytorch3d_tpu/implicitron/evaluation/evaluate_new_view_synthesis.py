"""New-view-synthesis evaluation.

Parity: reference implicitron/evaluation/evaluate_new_view_synthesis.py:147
(`eval_batch`: PSNR / masked PSNR / IoU / depth errors, aggregation :564).
LPIPS requires a pretrained torch net and is reported as None here.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np


def _mse(x, y, mask=None):
    d = (x - y) ** 2
    if mask is None:
        return jnp.mean(d)
    w = jnp.broadcast_to(mask, d.shape)
    return jnp.sum(d * w) / jnp.clip(jnp.sum(w), 1.0)


def _psnr(x, y, mask=None):
    return -10.0 * jnp.log10(jnp.clip(_mse(x, y, mask), 1e-12))


def _iou(pred, gt, threshold=0.5):
    p = pred > threshold
    g = gt > threshold
    inter = jnp.sum(p & g)
    union = jnp.sum(p | g)
    return inter / jnp.clip(union, 1.0)


def eval_batch(
    frame_data,
    preds: Dict[str, Any],
    bg_color: str = "black",
    mask_thr: float = 0.5,
    **kwargs,
) -> Dict[str, Optional[float]]:
    """Evaluate one rendered batch against ground truth (reference :147).

    frame_data: FrameData with image_rgb/fg_probability/depth_map.
    preds: dict with images_render / masks_render / depths_render.
    """
    image_gt = frame_data.image_rgb
    mask_gt = frame_data.fg_probability
    depth_gt = frame_data.depth_map
    image = preds["images_render"]
    mask = preds.get("masks_render")
    depth = preds.get("depths_render")

    results: Dict[str, Optional[float]] = {}
    results["psnr"] = float(_psnr(image, image_gt))
    results["rgb_l1"] = float(jnp.mean(jnp.abs(image - image_gt)))
    if mask_gt is not None:
        results["psnr_fg"] = float(_psnr(image, image_gt, mask_gt))
        results["rgb_l1_fg"] = float(
            jnp.sum(jnp.abs(image - image_gt) * mask_gt)
            / jnp.clip(jnp.sum(mask_gt) * image.shape[-1], 1.0)
        )
        if mask is not None:
            results["iou"] = float(_iou(mask, mask_gt, mask_thr))
            results["mask_bce"] = float(
                jnp.mean(
                    -(
                        mask_gt * jnp.log(jnp.clip(mask, 1e-6))
                        + (1 - mask_gt) * jnp.log(jnp.clip(1 - mask, 1e-6))
                    )
                )
            )
    if depth_gt is not None and depth is not None:
        valid = (depth_gt > 0).astype(jnp.float32)
        if mask_gt is not None:
            valid = valid * mask_gt
        results["depth_abs_fg"] = float(
            jnp.sum(jnp.abs(depth - depth_gt) * valid)
            / jnp.clip(jnp.sum(valid), 1.0)
        )
    results["lpips"] = None  # needs a pretrained perceptual net
    return results


def aggregate_nvs_results(
    per_batch_results: List[Dict[str, Optional[float]]]
) -> Dict[str, float]:
    """Average metrics over batches (reference :564)."""
    out: Dict[str, float] = {}
    keys = {k for r in per_batch_results for k in r}
    for k in keys:
        vals = [r[k] for r in per_batch_results if r.get(k) is not None]
        if vals:
            out[k] = float(np.mean(vals))
    return out
