"""IDR neural surface: SDF + feature vector field.

Parity: reference implicitron/models/implicit_function/idr_feature_field.py
(`IdrFeatureField`: geometric-init MLP returning (sdf, features)).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ....renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ...tools.config import registry
from .base import ImplicitFunctionBase


@registry.register
class IdrFeatureField(nn.Module, ImplicitFunctionBase):
    feature_vector_size: int = 3
    d_in: int = 3
    d_out: int = 1
    dims: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512, 512)
    geometric_init: bool = True
    bias: float = 1.0
    skip_in: Tuple[int, ...] = (4,)
    weight_norm: bool = False
    n_harmonic_functions_xyz: int = 6
    pooled_feature_dim: int = 0

    def setup(self):
        self.embed = HarmonicEmbedding(
            self.n_harmonic_functions_xyz, append_input=True
        )
        in_dim = self.embed.get_output_dim(self.d_in)
        out_total = self.d_out + self.feature_vector_size
        layer_dims = [in_dim] + list(self.dims) + [out_total]

        layers = []
        for li in range(len(layer_dims) - 1):
            out_d = layer_dims[li + 1]
            if li + 1 in self.skip_in:
                out_d = out_d - in_dim
            if self.geometric_init and li == len(layer_dims) - 2:
                # SDF of a sphere of radius `bias` at init
                kinit = nn.initializers.normal(
                    stddev=float(np.sqrt(np.pi) / np.sqrt(layer_dims[li]))
                )
                binit = nn.initializers.constant(-self.bias)
            else:
                kinit = nn.initializers.lecun_normal()
                binit = nn.initializers.zeros_init()
            layers.append(
                nn.Dense(out_d, kernel_init=kinit, bias_init=binit,
                         name=f"linear{li}")
            )
        self.layers = layers
        self._in_dim = in_dim

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
