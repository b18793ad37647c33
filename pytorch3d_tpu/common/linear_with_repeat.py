"""Linear layer on (input, repeated-input) pairs, used by the NeRF color
head (reference common/linear_with_repeat.py:17)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class LinearWithRepeat(nn.Module):
    """y = Linear(concat(x, broadcast(z))) without materializing the
    concatenation: applied as two partial matmuls (reference :17)."""

    features: int

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
        x, z = inputs  # x (..., S, D1), z (..., D2) broadcast over S
        d1 = x.shape[-1]
        d2 = z.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d1 + d2, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        out1 = x @ kernel[:d1]
        out2 = z @ kernel[d1:]
        return out1 + out2[..., None, :] + bias
