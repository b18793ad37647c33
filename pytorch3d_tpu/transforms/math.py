"""Numerically safe math helpers (parity: reference transforms/math.py)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

DEFAULT_ACOS_BOUND: float = 1.0 - 1e-4


def acos_linear_extrapolation(
    x: jnp.ndarray,
    bounds: Tuple[float, float] = (-DEFAULT_ACOS_BOUND, DEFAULT_ACOS_BOUND),
) -> jnp.ndarray:
    """arccos(x) with linear extrapolation outside ``bounds``.

    Inside ``[lower, upper]`` this is exactly ``arccos``; outside, the
    first-order Taylor approximation around the bound is used so that the
    function (and its gradient) stays finite for |x| -> 1 and beyond.
    """
    lower_bound, upper_bound = bounds
    if lower_bound > upper_bound:
        raise ValueError("lower bound has to be smaller or equal to upper bound.")
    if lower_bound <= -1.0 or upper_bound >= 1.0:
        raise ValueError("Both bounds have to be within (-1, 1).")

    x_upper = jnp.minimum(x, upper_bound)
    x_lower = jnp.maximum(x, lower_bound)
    x_mid = jnp.clip(x, lower_bound, upper_bound)

    acos_mid = jnp.arccos(x_mid)
    out = acos_mid
    out = jnp.where(
        x > upper_bound,
        _acos_linear_approximation(x, upper_bound),
        out,
    )
    out = jnp.where(
        x < lower_bound,
        _acos_linear_approximation(x, lower_bound),
        out,
    )
    del x_upper, x_lower
    return out


def _acos_linear_approximation(x: jnp.ndarray, x0: float) -> jnp.ndarray:
    """First-order Taylor expansion of arccos around x0."""
    import math

    return (x - x0) * _dacos_dx(x0) + math.acos(x0)


def _dacos_dx(x: float) -> float:
    import math

    return (-1.0) / math.sqrt(1.0 - x * x)
