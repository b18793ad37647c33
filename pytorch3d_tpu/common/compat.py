"""Compat helpers (reference common/compat.py: `meshgrid_ij` :19,
`prod` :39 — torch-version shims there; plain utilities here)."""

from __future__ import annotations

import math
from typing import Iterable

import jax.numpy as jnp


def meshgrid_ij(*A):
    """jnp.meshgrid with matrix indexing (reference compat.py:19)."""
    return jnp.meshgrid(*A, indexing="ij")


def prod(iterable: Iterable, *, start=1):
    """math.prod (reference compat.py:39)."""
    return math.prod(iterable, start=start)
