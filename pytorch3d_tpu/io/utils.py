"""IO helpers (reference io/utils.py: `PathOrStr`, `_open_file`,
`_check_faces_indices`, `_make_tensor`)."""

from __future__ import annotations

import contextlib
import pathlib
import warnings
from typing import IO, ContextManager, Union

import jax.numpy as jnp

PathOrStr = Union[pathlib.Path, str]


def _open_file(f, path_manager=None, mode: str = "r") -> ContextManager[IO]:
    """Open a path, or pass through an already-open stream
    (reference io/utils.py:29)."""
    if isinstance(f, (str, pathlib.Path)):
        return open(str(f), mode)
    return contextlib.nullcontext(f)


def _check_faces_indices(
    faces_indices: jnp.ndarray, max_index: int, pad_value=None
) -> jnp.ndarray:
    """Warn about out-of-bounds face indices (reference io/utils.py:69)."""
    if pad_value is None:
        mask = jnp.ones(faces_indices.shape[:-1], bool)
    else:
        mask = ~(faces_indices == pad_value).all(axis=-1)
    if bool(
        ((faces_indices[mask] >= max_index) | (faces_indices[mask] < 0)).any()
    ):
        warnings.warn("Faces have invalid indices")
    return faces_indices


def _make_tensor(data, cols: int, dtype=jnp.float32) -> jnp.ndarray:
    """List-of-rows to array, empty-safe (reference io/utils.py:94)."""
    if not len(data):
        return jnp.zeros((0, cols), dtype)
    return jnp.asarray(data, dtype)
