"""Image/depth metric utilities for implicitron evaluation and losses.

Parity: reference implicitron/tools/metric_utils.py (`eval_depth` :19,
`estimate_depth_scale_factor` :90, `calc_psnr` :96, `calc_mse` :109,
`rgb_l1` :198, `huber` :213, `neg_iou_loss` :224, `safe_sqrt` :236,
`iou` :241, `beta_prior` :260).  Channels-last (N, H, W, C) layout; all
reductions are over the per-sample axes so outputs are (N,) vectors like
the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def calc_mse(x, y, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean((x - y) ** 2, axis=tuple(range(1, x.ndim)))
    w = jnp.broadcast_to(mask, x.shape)
    num = jnp.sum(((x - y) ** 2) * w, axis=tuple(range(1, x.ndim)))
    den = jnp.clip(jnp.sum(w, axis=tuple(range(1, x.ndim))), 1e-8)
    return num / den


def calc_psnr(x, y, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.clip(calc_mse(x, y, mask), 1e-10))


def rgb_l1(pred, target, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        mask = jnp.ones_like(pred[..., :1])
    w = jnp.broadcast_to(mask, pred.shape)
    num = jnp.sum(jnp.abs(pred - target) * w, axis=tuple(range(1, pred.ndim)))
    den = jnp.clip(jnp.sum(w, axis=tuple(range(1, pred.ndim))), 1.0)
    return num / den


def iou(predict, target, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Soft IoU averaged over the batch (reference :241)."""
    dims = tuple(range(1, predict.ndim))
    if mask is not None:
        predict = predict * mask
        target = target * mask
    intersect = jnp.sum(predict * target, axis=dims)
    union = jnp.sum(predict + target - predict * target, axis=dims) + 1e-4
    return jnp.mean(intersect / union)


def neg_iou_loss(predict, target, mask=None) -> jnp.ndarray:
    return 1.0 - iou(predict, target, mask=mask)


def safe_sqrt(A, eps: float = 1e-4) -> jnp.ndarray:
    return jnp.sqrt(jnp.clip(A, 0.0) + eps)


def huber(dfsq, scaling: float = 0.03) -> jnp.ndarray:
    return (safe_sqrt(1.0 + dfsq / (scaling * scaling), eps=1e-4) - 1.0) * scaling


def beta_prior(pred, cap: float = 0.1) -> jnp.ndarray:
    if cap <= 0.0:
        raise ValueError("capping should be positive to avoid unbound loss")
    min_arg = jnp.minimum(
        cap * jnp.log(jnp.clip(pred, 1e-8)),
        cap * jnp.log(jnp.clip(1.0 - pred, 1e-8)),
    )
    return -min_arg


def estimate_depth_scale_factor(pred, gt, mask, clamp_thr) -> jnp.ndarray:
    dims = tuple(range(1, pred.ndim))
    xy = jnp.mean(pred * gt * mask, axis=dims)
    xx = jnp.mean(pred * pred * mask, axis=dims)
    return xy / jnp.clip(xx, clamp_thr)


def eval_depth(
    pred: jnp.ndarray,  # (N, H, W, 1)
    gt: jnp.ndarray,  # (N, H, W, 1)
    crop: int = 1,
    mask: Optional[jnp.ndarray] = None,
    get_best_scale: bool = True,
    mask_thr: float = 0.5,
    best_scale_clamp_thr: float = 1e-4,
    use_disparity: bool = False,
    disparity_eps: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth MSE/abs error with border crop, validity masking, and optimal
    per-sample scale alignment (reference metric_utils.py:19)."""
    if crop > 0:
        gt = gt[:, crop:-crop, crop:-crop]
        pred = pred[:, crop:-crop, crop:-crop]
        if mask is not None:
            mask = mask[:, crop:-crop, crop:-crop]
    if mask is not None:
        gt = gt * (mask > mask_thr).astype(gt.dtype)

    dmask = (gt > 0.0).astype(gt.dtype)
    dims = tuple(range(1, pred.ndim))
    dmask_mass = jnp.clip(jnp.sum(dmask, axis=dims), 1e-4)

    if get_best_scale:
        scale_best = estimate_depth_scale_factor(
            pred, gt, dmask, best_scale_clamp_thr
        )
        pred = pred * scale_best.reshape((-1,) + (1,) * (pred.ndim - 1))
    if use_disparity:
        gt = 1.0 / (gt + disparity_eps)
        pred = 1.0 / (pred + disparity_eps)
        scale_best = estimate_depth_scale_factor(
            pred, gt, dmask, best_scale_clamp_thr
        )
        pred = pred * scale_best.reshape((-1,) + (1,) * (pred.ndim - 1))

    df = gt - pred
    mse_depth = jnp.sum(dmask * df**2, axis=dims) / dmask_mass
    abs_depth = jnp.sum(dmask * jnp.abs(df), axis=dims) / dmask_mass
    return mse_depth, abs_depth


def log_lerp(x: jnp.ndarray, b: float) -> jnp.ndarray:
    """Linearly extrapolated log for x < b (reference metric_utils.py:190)."""
    assert b > 0
    return jnp.where(x >= b, jnp.log(jnp.maximum(x, b)), math.log(b) + (x - b) / b)


def binary_cross_entropy_lerp(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    weight: jnp.ndarray,
    lerp_bound: float,
) -> jnp.ndarray:
    """BCE with linearly-extrapolated log to avoid exploding gradients
    where pred or 1-pred < lerp_bound (reference :174)."""
    loss = log_lerp(1 - pred, lerp_bound) * (1 - gt) + log_lerp(
        pred, lerp_bound
    ) * gt
    return -(loss * weight).sum() / jnp.clip(weight.sum(), 1e-4)


def calc_bce(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    equal_w: bool = True,
    pred_eps: float = 0.01,
    mask: Optional[jnp.ndarray] = None,
    lerp_bound: Optional[float] = None,
    pred_logits: bool = False,
) -> jnp.ndarray:
    """Binary cross entropy with optional fg/bg balancing, prediction
    clamping, logits input, and log-lerp stabilization (reference :125)."""
    if pred_eps > 0.0:
        pred = jnp.clip(pred, pred_eps, 1.0 - pred_eps)
    if mask is None:
        mask = jnp.ones_like(gt)
    if equal_w:
        mask_fg = (gt > 0.5).astype(gt.dtype) * mask
        mask_bg = (1 - mask_fg) * mask
        weight = mask_fg / jnp.clip(mask_fg.sum(), 1.0) + mask_bg / jnp.clip(
            mask_bg.sum(), 1.0
        )
        weight = weight * (weight.size / jnp.clip(weight.sum(), 1.0))
    else:
        weight = jnp.ones_like(gt) * mask

    if lerp_bound is not None:
        if pred_logits:
            pred = jax.nn.sigmoid(pred)
        return binary_cross_entropy_lerp(pred, gt, weight, lerp_bound)
    if pred_logits:
        loss = (
            jnp.clip(pred, 0) - pred * gt + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        ) * weight
    else:
        p = jnp.clip(pred, 1e-12, 1 - 1e-12)
        loss = -(gt * jnp.log(p) + (1 - gt) * jnp.log1p(-p)) * weight
    return loss.mean()
