"""Iterative farthest point sampling (FPS).

Parity: reference ops/sample_farthest_points.py:18 (+ naive :106) and
csrc/sample_farthest_points/ (412 LoC, warp-reduced argmax per iteration).

TPU design: the selection loop is inherently sequential (K iterations); we
express it as a `lax.scan` carrying the running min-distance field, with a
full-width argmax per step (the VPU equivalent of the CUDA block reduce).
All batches run vectorized; variable lengths are -inf masks.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def sample_farthest_points(
    points: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    K: Union[int, jnp.ndarray] = 50,
    random_start_point: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Farthest point subsampling (reference :18).

    Args:
        points: (N, P, D).
        lengths: (N,) valid counts.
        K: number of samples (int; per-batch K arrays are clamped to max K
            with padding, reference behavior).
        random_start_point: random (per-cloud) start index.
        key: PRNG key for the random start.

    Returns:
        (selected_points (N, K, D), indices (N, K)); padded slots get idx -1
        and point 0.
    """
    N, P, D = points.shape
    if isinstance(K, jnp.ndarray):
        K_per = jnp.minimum(K.astype(jnp.int32), P)
        K_max = int(jnp.max(K_per))
    else:
        K_max = int(min(K, P))
        K_per = None

    if lengths is None:
        lengths = jnp.full((N,), P, dtype=jnp.int32)
    valid = jnp.arange(P, dtype=jnp.int32)[None, :] < lengths[:, None]  # (N, P)

    if random_start_point:
        if key is None:
            key = jax.random.PRNGKey(0)
        start = (
            jax.random.uniform(key, (N,)) * jnp.maximum(lengths, 1)
        ).astype(jnp.int32)
    else:
        start = jnp.zeros((N,), dtype=jnp.int32)

    batch = jnp.arange(N)
    init_min_d = jnp.where(valid, jnp.inf, -jnp.inf)  # (N, P)

    def step(carry, _):
        min_d, last_idx = carry
        last_pt = points[batch, last_idx]  # (N, D)
        d = jnp.sum((points - last_pt[:, None, :]) ** 2, axis=-1)  # (N, P)
        min_d = jnp.minimum(min_d, jnp.where(valid, d, -jnp.inf))
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        return (min_d, nxt), last_idx

    (_, _), idxs = jax.lax.scan(step, (init_min_d, start), None, length=K_max)
    idxs = jnp.swapaxes(idxs, 0, 1)  # (N, K_max)

    # Clamp to per-cloud budget: slot k valid iff k < min(K, lengths).
    budget = jnp.minimum(lengths, K_per if K_per is not None else K_max)
    slot_ok = jnp.arange(K_max, dtype=jnp.int32)[None, :] < budget[:, None]
    idxs = jnp.where(slot_ok, idxs, -1)
    pts = jax.vmap(lambda p, i: p[jnp.maximum(i, 0)])(points, idxs)
    pts = jnp.where((idxs >= 0)[..., None], pts, 0.0)
    return pts, idxs


def sample_farthest_points_naive(
    points, lengths=None, K=50, random_start_point=False, key=None
):
    """Reference-naming alias (ops/sample_farthest_points.py:106)."""
    return sample_farthest_points(points, lengths, K, random_start_point, key)
