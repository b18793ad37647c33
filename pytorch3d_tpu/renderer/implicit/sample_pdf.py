"""Inverse-CDF importance sampling along rays (NeRF fine pass).

Parity: reference renderer/implicit/sample_pdf.py:14 + csrc/sample_pdf/
(373 LoC).  On TPU the searchsorted is a vectorized `jnp.searchsorted`
(XLA binary search) — no custom kernel needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_pdf(
    bins: jnp.ndarray,  # (..., n_bins+1) bin edges
    weights: jnp.ndarray,  # (..., n_bins)
    n_samples: int,
    det: bool = False,
    eps: float = 1e-5,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sample depths proportionally to `weights` (reference :14).

    Returns (..., n_samples) samples in the range of bins.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    batch_shape = cdf.shape[:-1]
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, batch_shape + (n_samples,))
    else:
        u = jax.random.uniform(key, batch_shape + (n_samples,), cdf.dtype)

    # searchsorted(side="right") as a broadcast comparison count: the
    # default jnp.searchsorted lowers to a log2(n)-step sequential scan;
    # with n_bins ~ 64 the (bins+1, n_samples) compare matrix is tiny,
    # fully vectorized, and fuses into the surrounding math.
    inds = jnp.sum(
        (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
    )

    below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(inds, 0, cdf.shape[-1] - 1)

    # edge/cdf values at below/above via one-hot masked reductions over
    # the bin axis rather than take_along_axis: four minor-axis gathers
    # of (rays, n_samples) indices ran ~18.5 ms at the NeRF fine-pass
    # shape (scalar-gather bound) where the equivalent masked reductions
    # are plain VPU work that fuses with the compare matrix (~0.5 ms).
    iota = jnp.arange(cdf.shape[-1], dtype=jnp.int32)
    oh_below = iota[..., :, None] == below[..., None, :]
    oh_above = iota[..., :, None] == above[..., None, :]

    def pick(vals, onehot):
        return jnp.sum(
            jnp.where(onehot, vals[..., :, None], 0.0), axis=-2
        )

    cdf_g0 = pick(cdf, oh_below)
    cdf_g1 = pick(cdf, oh_above)
    bins_g0 = pick(bins, oh_below)
    bins_g1 = pick(bins, oh_above)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def sample_pdf_python(bins, weights, n_samples, det=False, eps=1e-5, key=None):
    """Reference-naming alias (sample_pdf.py:69)."""
    return sample_pdf(bins, weights, n_samples, det, eps, key)
