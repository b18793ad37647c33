"""Workaround utilities (reference common/workaround/utils.py)."""

from __future__ import annotations

import jax.numpy as jnp


def _safe_det_3x3(t: jnp.ndarray) -> jnp.ndarray:
    """Cofactor-expansion determinant of (..., 3, 3) matrices
    (reference workaround/utils.py:13)."""
    return (
        t[..., 0, 0]
        * (t[..., 1, 1] * t[..., 2, 2] - t[..., 1, 2] * t[..., 2, 1])
        - t[..., 0, 1]
        * (t[..., 1, 0] * t[..., 2, 2] - t[..., 2, 0] * t[..., 1, 2])
        + t[..., 0, 2]
        * (t[..., 1, 0] * t[..., 2, 1] - t[..., 2, 0] * t[..., 1, 1])
    )
