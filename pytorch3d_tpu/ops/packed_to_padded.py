"""Differentiable packed <-> padded scatter/gather over ragged batches.

Parity: reference ops/packed_to_padded.py:66/:156 + csrc/packed_to_padded_tensor/
(424 LoC).  On TPU both directions are plain gathers with computed flat
indices; XLA's gather transpose is the backward (the reference needs custom
autograd Functions).
"""

from __future__ import annotations

import jax.numpy as jnp


def packed_to_padded(
    inputs: jnp.ndarray, first_idxs: jnp.ndarray, max_size: int
) -> jnp.ndarray:
    """(F, ...) packed + (N,) first indices -> (N, max_size, ...) padded.

    Reference ops/packed_to_padded.py:66.  Elements beyond each segment are 0.
    """
    flat = False
    if inputs.ndim == 1:
        inputs = inputs[:, None]
        flat = True
    F = inputs.shape[0]
    N = first_idxs.shape[0]
    ends = jnp.concatenate([first_idxs[1:], jnp.asarray([F], first_idxs.dtype)])
    sizes = ends - first_idxs  # (N,)
    k = jnp.arange(max_size, dtype=jnp.int32)[None, :]  # (1, M)
    src = first_idxs[:, None] + k  # (N, M)
    valid = k < sizes[:, None]
    out = inputs[jnp.clip(src, 0, F - 1)]  # (N, M, ...)
    out = jnp.where(
        valid.reshape(valid.shape + (1,) * (out.ndim - 2)), out, 0.0
    )
    if flat:
        out = out[..., 0]
    return out


def padded_to_packed(
    inputs: jnp.ndarray,
    first_idxs: jnp.ndarray,
    num_inputs: int,
    max_size_dim: int = 1,
) -> jnp.ndarray:
    """(N, M, ...) padded -> (num_inputs, ...) packed (reference :156)."""
    inputs = jnp.moveaxis(inputs, max_size_dim, 1)
    N, M = inputs.shape[:2]
    flat = inputs.reshape((N * M,) + inputs.shape[2:])
    # position i in packed output belongs to segment n(i) with offset
    # i - first_idxs[n(i)]; compute n(i) via searchsorted.
    i = jnp.arange(num_inputs, dtype=jnp.int32)
    seg = jnp.searchsorted(first_idxs, i, side="right").astype(jnp.int32) - 1
    offs = i - first_idxs[seg]
    return flat[seg * M + offs]
