"""Fixed-radius neighbor search with first-K semantics.

Parity: reference ops/ball_query.py:58 + csrc/ball_query/ (313 LoC).

TPU design: instead of the CUDA early-exit scan, we compute the masked
distance matrix once (MXU matmul) and select the *first* K in-radius
neighbors with a `top_k` over the score ``-j`` (smaller index = larger
score), which reproduces the reference's first-come ordering without any
data-dependent loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .knn import _KNN, _pairwise_dist, knn_gather


def ball_query(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    lengths1: Optional[jnp.ndarray] = None,
    lengths2: Optional[jnp.ndarray] = None,
    K: int = 500,
    radius: float = 0.2,
    return_nn: bool = True,
) -> _KNN:
    """First K neighbors of p1 within `radius` in p2 (reference :58).

    Returns _KNN(dists, idx, nn); unfilled slots have idx -1, dist 0, nn 0.
    """
    if p1.ndim != 3 or p2.ndim != 3:
        raise ValueError("p1 and p2 must be (N, P, D) arrays")
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    K = int(min(K, P2))

    d = _pairwise_dist(p1, p2, norm=2)  # (N, P1, P2) squared
    inside = d < radius * radius
    if lengths2 is not None:
        valid2 = jnp.arange(P2, dtype=jnp.int32)[None, :] < lengths2[:, None]
        inside = inside & valid2[:, None, :]

    # first-K selection: score = -j for in-radius, -inf otherwise
    j = jnp.arange(P2, dtype=jnp.float32)
    score = jnp.where(inside, -j[None, None, :], -jnp.inf)
    top_score, _ = jax.lax.top_k(score, K)  # largest score = smallest j
    filled = jnp.isfinite(top_score)
    idx = jnp.where(filled, (-top_score).astype(jnp.int32), -1)

    dists = jnp.take_along_axis(d, jnp.maximum(idx, 0), axis=-1)
    dists = jnp.where(filled, dists, 0.0)

    if lengths1 is not None:
        valid1 = jnp.arange(P1, dtype=jnp.int32)[None, :] < lengths1[:, None]
        idx = jnp.where(valid1[..., None], idx, -1)
        dists = jnp.where(valid1[..., None], dists, 0.0)

    nn = None
    if return_nn:
        nn = knn_gather(p2, jnp.maximum(idx, 0))
        nn = jnp.where((idx >= 0)[..., None], nn, 0.0)
    return _KNN(dists=dists, idx=idx, knn=nn)
