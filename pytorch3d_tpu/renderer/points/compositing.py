"""Point compositing functionals: alpha / norm-weighted / weighted sum.

Parity: reference renderer/compositing.py:68/:148/:227 + csrc/compositing/
(1,394 LoC fwd/bwd kernels).  On TPU these are gathers + a cumprod along K
— fully differentiable through XLA, no custom backward.

Layouts follow the reference: pointsidx (N, K, H, W), alphas (N, K, H, W),
features (C, P_packed) -> output (N, C, H, W).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_feats(features: jnp.ndarray, pointsidx: jnp.ndarray):
    """features (C, P), idx (N, K, H, W) -> (N, C, K, H, W), 0 where idx<0.

    Gathers point-major rows ((P, C) layout) so each fetched cache line
    carries a whole point's channels — indexing the channel-major (C, P)
    layout directly costs C scalar gathers P apart (the pulsar blend
    measured ~70% of its forward in exactly that pattern)."""
    sel = jnp.maximum(pointsidx, 0)
    g = jnp.swapaxes(features, 0, 1)[sel]  # (N, K, H, W, C) row gather
    g = jnp.moveaxis(g, -1, 1)  # (N, C, K, H, W)
    return jnp.where((pointsidx >= 0)[:, None], g, 0.0)


def _masked_alphas(alphas, pointsidx):
    return jnp.where(pointsidx >= 0, alphas, 0.0)


def alpha_composite(pointsidx, alphas, features) -> jnp.ndarray:
    """Front-to-back over: sum_k alpha_k * prod_{j<k} (1 - alpha_j) * f_k
    (reference renderer/compositing.py:68)."""
    a = _masked_alphas(alphas, pointsidx)  # (N, K, H, W)
    f = _gather_feats(features, pointsidx)  # (N, C, K, H, W)
    one_minus = 1.0 - a
    # exclusive cumprod along K
    cum = jnp.cumprod(one_minus, axis=1)
    t = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
    w = a * t  # (N, K, H, W)
    return jnp.sum(w[:, None] * f, axis=2)


def norm_weighted_sum(pointsidx, alphas, features) -> jnp.ndarray:
    """Normalized weighted sum (reference :148)."""
    a = _masked_alphas(alphas, pointsidx)
    f = _gather_feats(features, pointsidx)
    denom = jnp.clip(jnp.sum(a, axis=1, keepdims=True), 1e-10)
    w = a / denom
    return jnp.sum(w[:, None] * f, axis=2)


def weighted_sum(pointsidx, alphas, features) -> jnp.ndarray:
    """Unnormalized weighted sum (reference :227)."""
    a = _masked_alphas(alphas, pointsidx)
    f = _gather_feats(features, pointsidx)
    return jnp.sum(a[:, None] * f, axis=2)
