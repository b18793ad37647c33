"""Representation conversion primitives (parity: reference structures/utils.py).

These operate at the host/python boundary (lists of variable-size arrays in,
static padded/packed arrays out) and are intentionally not jittable — inside
jit everything is padded+mask.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


def list_to_padded(
    x: Sequence[jnp.ndarray],
    pad_size: Optional[Sequence[int]] = None,
    pad_value: float = 0.0,
    equisized: bool = False,
) -> jnp.ndarray:
    """Stack a list of (Ki, ...) arrays into (N, K_max, ...) with padding."""
    if equisized:
        return jnp.stack(list(x), axis=0)
    x = [jnp.asarray(t) for t in x]
    ndim = x[0].ndim
    if any(t.ndim != ndim for t in x):
        raise ValueError("All items have to have the same number of dimensions!")
    if pad_size is None:
        pad_dims = [max(t.shape[d] for t in x) for d in range(ndim)]
    else:
        if len(pad_size) != ndim:
            raise ValueError(
                "Pad size must contain target size for all dimensions."
            )
        pad_dims = list(pad_size)
    out = np.full((len(x), *pad_dims), pad_value, dtype=np.asarray(x[0]).dtype)
    for i, t in enumerate(x):
        t = np.asarray(t)
        if t.size == 0:
            continue
        slices = (i,) + tuple(slice(0, s) for s in t.shape)
        out[slices] = t
    return jnp.asarray(out)


def padded_to_list(
    x: jnp.ndarray, split_size: Optional[Sequence] = None
) -> List[jnp.ndarray]:
    """Split (N, K, ...) into a list of N arrays, truncated per split_size."""
    x_list = [x[i] for i in range(x.shape[0])]
    if split_size is None:
        return x_list
    if len(split_size) != x.shape[0]:
        raise ValueError("Split size must be of same length as inputs first dimension")
    for i, s in enumerate(split_size):
        if isinstance(s, int):
            x_list[i] = x_list[i][:s]
        else:
            slices = tuple(slice(0, d) for d in s)
            x_list[i] = x_list[i][slices]
    return x_list


def list_to_packed(
    x: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate a list into a packed array plus index bookkeeping.

    Returns (x_packed, num_items, item_packed_first_idx, item_packed_to_list_idx).
    """
    sizes = [int(t.shape[0]) for t in x]
    num_items = jnp.asarray(sizes, dtype=jnp.int32)
    first_idx = jnp.asarray(np.cumsum([0] + sizes[:-1]), dtype=jnp.int32)
    packed = jnp.concatenate([jnp.asarray(t) for t in x], axis=0)
    to_list_idx = jnp.asarray(
        np.repeat(np.arange(len(x)), sizes), dtype=jnp.int32
    )
    return packed, num_items, first_idx, to_list_idx


def packed_to_list(x: jnp.ndarray, split_size: Union[Sequence[int], int]):
    """Split a packed (sum(K), ...) array back into a list."""
    if isinstance(split_size, int):
        n = x.shape[0] // split_size
        return [x[i * split_size : (i + 1) * split_size] for i in range(n)]
    out = []
    start = 0
    for s in split_size:
        out.append(x[start : start + s])
        start += s
    return out


def padded_to_packed(
    x: jnp.ndarray,
    split_size: Optional[Sequence[int]] = None,
    pad_value: Optional[float] = None,
    max_size_dim: int = 1,
) -> jnp.ndarray:
    """Flatten (N, K, ...) padded into packed, dropping padding per split_size.

    Host-side (output size is data dependent).  Inside jit, use the static
    reshape + mask scheme from `Meshes`/`Pointclouds` instead.
    """
    if split_size is not None and pad_value is not None:
        raise ValueError("Only one of split_size or pad_value should be provided.")
    x = jnp.moveaxis(x, max_size_dim, 1) if max_size_dim != 1 else x
    N, M = x.shape[:2]
    if split_size is None and pad_value is None:
        return x.reshape((N * M,) + x.shape[2:])
    xs = []
    if pad_value is not None:
        for i in range(N):
            row = x[i]
            keep = ~np.all(
                np.asarray(row).reshape(M, -1) == pad_value, axis=-1
            )
            xs.append(row[jnp.asarray(keep)])
        return jnp.concatenate(xs, axis=0)
    if len(split_size) != N:
        raise ValueError("Split size must be of same length as inputs first dimension")
    for i in range(N):
        xs.append(x[i, : split_size[i]])
    return jnp.concatenate(xs, axis=0)
