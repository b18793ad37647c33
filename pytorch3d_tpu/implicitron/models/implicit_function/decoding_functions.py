"""Decoding functions for implicit functions.

Parity: reference implicitron/models/implicit_function/decoding_functions.py:
`DecoderFunctionBase` :41, `ElementwiseDecoder` :62, `MLPWithInputSkips`
:105, `MLPDecoder` :249, plus `TransformerWithInputSkips` :302 /
`TransformerEncoderLayer` :427 — a transformer trunk with input skips
that ALTERNATES attention over the un-aggregated source-view ("pool")
axis and the ray-point axis per layer, with `dim_down_factor` shrinking
the width each layer, and a final softmax-weighted pooling over the
source-view axis (reference :419-421).

TPU notes: all shapes static; MLP layers and both attention axes are
batched MXU matmuls (flax Dense / MultiHeadDotProductAttention); the
pool axis is short (n_src views) so the pool attention batches over
rays*points.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...tools.config import ReplaceableBase, registry


class DecoderActivation(Enum):
    """Activation choices (reference decoding_functions.py:34); modules
    here also accept the raw string values."""

    RELU = "relu"
    SOFTPLUS = "softplus"
    SIGMOID = "sigmoid"
    IDENTITY = "identity"


class DecoderFunctionBase(ReplaceableBase):
    """Maps the embedding of a spatial location to the required quantity
    (density / color) (reference decoding_functions.py:41)."""


_ACTIVATIONS = {
    "relu": nn.relu,
    "softplus": nn.softplus,
    "sigmoid": nn.sigmoid,
    "identity": lambda t: t,
}


@registry.register
class ElementwiseDecoder(nn.Module, DecoderFunctionBase):
    """`result = operation(input * scale + shift)` with operation one of
    relu / softplus / sigmoid / identity (reference :62)."""

    scale: float = 1.0
    shift: float = 0.0
    operation: str = "identity"

    def __call__(
        self, features: jnp.ndarray, z: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if self.operation not in _ACTIVATIONS:
            raise ValueError(
                "`operation` can only be `relu`, `softplus`, `sigmoid`"
                " or `identity`."
            )
        return _ACTIVATIONS[self.operation](
            features * self.scale + self.shift
        )


class MLPWithInputSkips(nn.Module):
    """NeRF-style MLP with skip connections (reference :105): a stack of
    Dense+activation layers; at indices in `input_skips` the skip tensor
    `z` is concatenated (or, with `skip_affine_trans`, applied as a
    predicted affine map `(y - mu) * softplus(log_std)`).

    Matches the reference option surface: `last_layer_bias_init` sets the
    final bias constant; `last_activation` picks the final nonlinearity;
    `use_xavier_init` selects xavier-uniform weight init (flax's default
    lecun-normal stands in for torch's default kaiming-uniform otherwise —
    both are fan-in-scaled)."""

    n_layers: int = 8
    input_dim: int = 39  # informational; flax infers input width
    output_dim: int = 256
    skip_dim: int = 39
    hidden_dim: int = 256
    input_skips: Tuple[int, ...] = (5,)
    skip_affine_trans: bool = False
    last_layer_bias_init: Optional[float] = None
    last_activation: str = "relu"
    use_xavier_init: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if self.last_activation not in _ACTIVATIONS:
            raise ValueError(
                "`last_activation` can only be `relu`, `softplus`,"
                " `sigmoid` or `identity`."
            )
        if z is None:
            z = x
        kinit = (
            nn.initializers.xavier_uniform()
            if self.use_xavier_init
            else nn.initializers.lecun_normal()
        )
        y = x
        for li in range(self.n_layers):
            last = li + 1 >= self.n_layers
            if li in self.input_skips:
                if self.skip_affine_trans:
                    mu_log_std = nn.Dense(
                        2 * self.hidden_dim,
                        kernel_init=kinit,
                        name=f"skip_affine{li}b",
                    )(
                        nn.relu(
                            nn.Dense(
                                2 * self.hidden_dim,
                                kernel_init=kinit,
                                name=f"skip_affine{li}a",
                            )(z)
                        )
                    )
                    mu, log_std = jnp.split(mu_log_std, 2, axis=-1)
                    y = (y - mu) * nn.softplus(log_std)
                else:
                    y = jnp.concatenate([y, z], axis=-1)
            bias_init = (
                nn.initializers.constant(self.last_layer_bias_init)
                if last and self.last_layer_bias_init is not None
                else nn.initializers.zeros_init()
            )
            y = nn.Dense(
                self.output_dim if last else self.hidden_dim,
                kernel_init=kinit,
                bias_init=bias_init,
                name=f"layer{li}",
            )(y)
            y = _ACTIVATIONS[self.last_activation if last else "relu"](y)
        return y


@registry.register
class MLPDecoder(nn.Module, DecoderFunctionBase):
    """Decoder wrapping `MLPWithInputSkips` (reference :249). `network_args`
    configures the inner MLP; `input_dim` is informational (flax infers)."""

    input_dim: int = 3
    network_args: Optional[Dict[str, Any]] = None
    param_groups: Optional[Dict[str, str]] = None

    @nn.compact
    def __call__(
        self, features: jnp.ndarray, z: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        args = dict(self.network_args or {})
        args.setdefault("input_dim", self.input_dim)
        return MLPWithInputSkips(**args, name="network")(features, z)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer with optional output-width reduction via a
    truncated residual (reference decoding_functions.py:427: the residual
    keeps the first `d_model_out` channels when the FF narrows)."""

    d_model: int
    d_model_out: int
    n_heads: int = 4
    dim_feedforward: int = 64

    @nn.compact
    def __call__(self, src: jnp.ndarray) -> jnp.ndarray:
        """src: (batch, seq, d_model) -> (batch, seq, d_model_out)."""
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            name="self_attn",
        )(src, src)
        src = nn.LayerNorm(name="norm1")(src + attn)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(src)
        ff = nn.Dense(self.d_model_out, name="linear2")(nn.relu(ff))
        src = src[..., : self.d_model_out] + ff
        return nn.LayerNorm(name="norm2")(src)


class TransformerWithInputSkips(nn.Module):
    """Dual-axis transformer trunk with input skips
    (reference decoding_functions.py:302).

    Input `x` of shape `(n_pool, ..., n_pts, C)` (the leading axis is the
    un-aggregated source-view axis; pass `pool_axis=False` for inputs
    without one, in which case a singleton pool axis is added).  Each layer
    attends first across the pool axis (batched over rays x points), then
    across the ray-point axis (batched over pool x rays), with widths
    `hidden_dim / dim_down_factor**layer`.  The pool axis is collapsed at
    the end by softmax weights from channel 0 (reference :419-421).
    """

    n_layers: int = 2
    output_dim: int = 256
    skip_dim: int = 39
    hidden_dim: int = 64
    input_skips: Tuple[int, ...] = (1,)
    n_heads: int = 4
    dim_down_factor: float = 1.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, z: jnp.ndarray, pool_axis: bool = False
    ) -> jnp.ndarray:
        """x, z: (n_pool?, ..., n_pts, C) -> (..., n_pts, output_dim)."""
        if not pool_axis:
            x = x[None]
            z = z[None]
        V = x.shape[0]
        lead = x.shape[1:-2]
        P = x.shape[-2]

        y = nn.Dense(self.hidden_dim, name="first")(x)
        # (V, R, P, d) with R = prod(lead)
        y = y.reshape((V, -1, P, self.hidden_dim))
        z_flat = z.reshape((V, -1, P, z.shape[-1]))
        R = y.shape[1]

        skips = set(self.input_skips)
        dims = [
            int(round(self.hidden_dim / (self.dim_down_factor**i)))
            for i in range(self.n_layers + 1)
        ]
        for li in range(self.n_layers):
            dimin, dimout = dims[li], dims[li + 1]
            if li in skips:
                y = y + nn.Dense(dimin, name=f"skip{li}")(z_flat)
            # attention across the pool (source-view) axis: batch R*P rows
            yp = jnp.moveaxis(y, 0, 2).reshape((R * P, V, dimin))
            yp = TransformerEncoderLayer(
                d_model=dimin,
                d_model_out=dimout,
                n_heads=self.n_heads,
                dim_feedforward=self.hidden_dim,
                name=f"pool{li}",
            )(yp)
            # attention across the ray-point axis: batch V*R rows
            yr = jnp.moveaxis(yp.reshape((R, P, V, dimout)), 2, 0).reshape(
                (V * R, P, dimout)
            )
            yr = TransformerEncoderLayer(
                d_model=dimout,
                d_model_out=dimout,
                n_heads=self.n_heads,
                dim_feedforward=self.hidden_dim,
                name=f"ray{li}",
            )(yr)
            y = yr.reshape((V, R, P, dimout))

        # softmax-pool the source-view axis on channel 0 (reference :419)
        w = nn.softmax(y[..., :1], axis=0)
        y = jnp.sum(y * w, axis=0)  # (R, P, dimlast)
        y = nn.Dense(self.output_dim, name="last")(y)
        return y.reshape(lead + (P, self.output_dim))
