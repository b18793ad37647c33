"""Autodecoder: learned per-sequence latent codes.

Parity: reference implicitron/models/global_encoder/autodecoder.py
(`Autodecoder`: embedding table keyed by hashed sequence name).
"""

from __future__ import annotations

import zlib
from typing import List, Optional, Union

import flax.linen as nn
import jax.numpy as jnp


class Autodecoder(nn.Module):
    encoding_dim: int = 0
    n_instances: int = 1
    init_scale: float = 1.0
    ignore_input: bool = False

    def _build_key_map(self):
        return {}

    @nn.compact
    def __call__(self, x: Union[jnp.ndarray, List[str]]) -> Optional[jnp.ndarray]:
        """x: (B,) int codes or list of sequence-name strings -> (B, D)."""
        if self.encoding_dim <= 0:
            return None
        table = nn.Embed(
            self.n_instances,
            self.encoding_dim,
            embedding_init=nn.initializers.normal(
                self.init_scale / max(self.encoding_dim, 1) ** 0.5
            ),
        )
        if self.ignore_input or x is None:
            # single-scene use (e.g. the overfit trainer) provides no
            # sequence names; everything shares code 0
            idx = jnp.zeros((1,), jnp.int32)
        elif isinstance(x, (list, tuple)):
            # stable across processes — python's hash() is randomized per
            # run, which would remap sequences to different codes after a
            # checkpoint resume
            idx = jnp.asarray(
                [
                    zlib.crc32(s.encode("utf8")) % self.n_instances
                    for s in x
                ],
                jnp.int32,
            )
        else:
            idx = jnp.asarray(x, jnp.int32) % self.n_instances
        return table(idx)

    def get_encoding_dim(self) -> int:
        return self.encoding_dim
