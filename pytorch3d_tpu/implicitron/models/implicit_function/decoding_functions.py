"""Decoding trunks for implicit functions.

Parity: reference implicitron/models/implicit_function/decoding_functions.py
(`TransformerWithInputSkips` :302): a transformer trunk with skip inputs,
used by NeRFormer.  The reference alternates attention over the pooled
source-view axis and the ray-point axis; our GenericModel aggregates source
views before the trunk (ReductionFeatureAggregator), so this TPU version
attends over the ray-point axis — the axis present in our layout — with the
same skip-projection structure.  All shapes static; attention is batched
MXU matmuls.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class TransformerWithInputSkips(nn.Module):
    """Self-attention trunk over ray points with input skips
    (reference decoding_functions.py:302)."""

    n_layers: int = 2
    output_dim: int = 256
    skip_dim: int = 39
    hidden_dim: int = 64
    input_skips: Tuple[int, ...] = (1,)
    n_heads: int = 4
    dim_down_factor: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        """x, z: (..., n_pts, C) -> (..., n_pts, output_dim)."""
        lead = x.shape[:-2]
        P = x.shape[-2]
        y = nn.Dense(self.hidden_dim, name="first")(x)
        y = y.reshape((-1, P, self.hidden_dim))
        z_flat = z.reshape((-1, P, z.shape[-1]))

        skips = set(self.input_skips)
        for li in range(self.n_layers):
            if li in skips:
                y = y + nn.Dense(y.shape[-1], name=f"skip{li}")(z_flat)
            # pre-LN transformer encoder layer over the point axis
            h = nn.LayerNorm(name=f"ln_attn{li}")(y)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads,
                qkv_features=self.hidden_dim,
                out_features=y.shape[-1],
                name=f"attn{li}",
            )(h, h)
            y = y + h
            f = nn.LayerNorm(name=f"ln_ff{li}")(y)
            f = nn.Dense(self.hidden_dim, name=f"ff_a{li}")(f)
            f = nn.relu(f)
            f = nn.Dense(y.shape[-1], name=f"ff_b{li}")(f)
            y = y + f

        y = nn.Dense(self.output_dim, name="last")(y)
        return y.reshape(lead + (P, self.output_dim))
