"""IDR neural surface: SDF + feature vector field.

Parity: reference implicitron/models/implicit_function/idr_feature_field.py
(`IdrFeatureField`: geometric-init MLP returning (sdf, features)).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import jax
import jax.numpy as jnp  # noqa: F811 (used by initializers)

from ....renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ...tools.config import registry
from .base import ImplicitFunctionBase


class _WeightNormDense(nn.Module):
    """Dense with weight normalization: W = g * v / |v|_col, g learned
    per output unit and initialized to |v_init| so the initial forward
    pass equals the un-normalized layer (torch.nn.utils.weight_norm
    semantics, used by the reference IDR field, idr_feature_field.py:117)."""

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        v = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        norm0 = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-12)
        g = self.param("scale", lambda rng, shape: norm0.reshape(shape),
                       (self.features,))
        b = self.param("bias", self.bias_init, (self.features,))
        w = v * (g / norm0.reshape(-1))
        return jnp.dot(x, w) + b


@registry.register
class IdrFeatureField(nn.Module, ImplicitFunctionBase):
    feature_vector_size: int = 3
    d_in: int = 3
    d_out: int = 1
    dims: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512, 512)
    geometric_init: bool = True
    bias: float = 1.0
    skip_in: Tuple[int, ...] = ()
    weight_norm: bool = True
    n_harmonic_functions_xyz: int = 0
    pooled_feature_dim: int = 0

    def setup(self):
        self.embed = HarmonicEmbedding(
            self.n_harmonic_functions_xyz, append_input=True
        )
        in_dim = self.embed.get_output_dim(self.d_in)
        out_total = self.d_out + self.feature_vector_size
        layer_dims = [in_dim] + list(self.dims) + [out_total]
        n_lin = len(layer_dims) - 1

        layers = []
        for li in range(n_lin):
            out_d = layer_dims[li + 1]
            if li + 1 in self.skip_in:
                out_d = out_d - in_dim
            if self.geometric_init:
                kinit, binit = self._geometric_init_for(
                    li, n_lin, layer_dims[li], out_d, in_dim
                )
            else:
                kinit = nn.initializers.lecun_normal()
                binit = nn.initializers.zeros_init()
            cls = _WeightNormDense if self.weight_norm else nn.Dense
            layers.append(
                cls(out_d, kernel_init=kinit, bias_init=binit,
                    name=f"linear{li}")
            )
        self.layers = layers
        self._in_dim = in_dim

    def _geometric_init_for(self, li, n_lin, in_d, out_d, embed_dim):
        """Sphere-SDF initialization (reference idr_feature_field.py:98,
        from github.com/lioryariv/idr): the net starts out approximating
        sdf(x) ~ |x| - bias.  Flax kernels are (in, out), so the
        reference's row slices become row (input-dim) slices here; where
        the reference zeroes all but the first 3 input columns we keep
        the 3 RAW xyz channels of the harmonic embedding (layout
        [sin.., cos.., xyz]) — same intent, layout-corrected."""
        std_mid = float(np.sqrt(2.0) / np.sqrt(out_d))
        if li == n_lin - 1:
            # last layer: mean sqrt(pi)/sqrt(d_in), tiny spread; bias -b
            mean = float(np.sqrt(np.pi) / np.sqrt(in_d))

            def kinit(rng, shape, dtype=jnp.float32):
                return mean + 1e-4 * jax.random.normal(rng, shape, dtype)

            return kinit, nn.initializers.constant(-self.bias)
        if li == 0:

            def kinit(rng, shape, dtype=jnp.float32):
                w = jnp.zeros(shape, dtype)
                # raw xyz occupies the LAST 3 embedding channels
                return w.at[-3:, :].set(
                    std_mid * jax.random.normal(rng, (3, shape[1]), dtype)
                )

            return kinit, nn.initializers.zeros_init()
        if li in self.skip_in:

            def kinit(rng, shape, dtype=jnp.float32):
                w = std_mid * jax.random.normal(rng, shape, dtype)
                # zero the harmonic part of the appended skip input,
                # keep its raw xyz (last 3 rows)
                return w.at[-embed_dim:-3, :].set(0.0)

            return kinit, nn.initializers.zeros_init()
        return (
            nn.initializers.normal(stddev=std_mid),
            nn.initializers.zeros_init(),
        )

    def __call__(self, points: jnp.ndarray, **kwargs) -> jnp.ndarray:
        """points (..., 3) -> (..., 1 + feature_vector_size): sdf + feats."""
        x0 = self.embed(points)
        x = x0
        n = len(self.layers)
        for li, layer in enumerate(self.layers):
            if li in self.skip_in:
                x = jnp.concatenate([x, x0], axis=-1) / jnp.sqrt(2.0)
            x = layer(x)
            if li < n - 1:
                x = nn.softplus(x * 100.0) / 100.0  # beta=100 softplus
        return x

    def get_sdf(self, points):
        return self(points)[..., 0]
