"""NaN-safe vector math for autodiff.

JAX's `jnp.linalg.norm` has a NaN gradient at 0 (d|x|/dx = x/|x|), and a
zero cotangent does NOT mask it (0 * nan = nan), so any norm over padded
(zero) rows poisons the whole backward pass.  These helpers use the
double-where trick: degenerate inputs are replaced *before* the sqrt, so
both value and gradient are exactly 0 there.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(
    x: jnp.ndarray, axis: int = -1, keepdims: bool = False, eps: float = 1e-20
) -> jnp.ndarray:
    """L2 norm with zero (not NaN) gradient where ||x|| == 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    ok = sq > eps
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)


def safe_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-20) -> jnp.ndarray:
    """x / ||x|| with zero output (and zero gradient) where ||x|| == 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    ok = sq > eps
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
    return x * inv
