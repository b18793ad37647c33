"""Global (per-frame / per-sequence) encoders.

Parity: reference implicitron/models/global_encoder/global_encoder.py
(`GlobalEncoderBase` :22, `SequenceAutodecoder` :62, `HarmonicTimeEncoder`
:94).
"""

from __future__ import annotations

from typing import List, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from ....renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ...tools.config import ReplaceableBase, registry
from .autodecoder import Autodecoder


class GlobalEncoderBase(ReplaceableBase):
    def get_encoding_dim(self) -> int:
        raise NotImplementedError

    def calculate_squared_encoding_norm(self):
        return None


@registry.register
class SequenceAutodecoder(nn.Module, GlobalEncoderBase):
    """Per-sequence learned codes (reference :62)."""

    encoding_dim: int = 64
    n_instances: int = 100

    def setup(self):
        self.autodecoder = Autodecoder(
            encoding_dim=self.encoding_dim, n_instances=self.n_instances
        )

    def get_encoding_dim(self) -> int:
        return self.encoding_dim

    def __call__(self, frame_timestamp=None, sequence_name=None, **kwargs):
        return self.autodecoder(sequence_name)


@registry.register
class HarmonicTimeEncoder(nn.Module, GlobalEncoderBase):
    """Harmonic embedding of the frame timestamp (reference :94)."""

    n_harmonic_functions: int = 10
    append_input: bool = True
    time_divisor: float = 1.0

    def setup(self):
        self._harmonic_embedding = HarmonicEmbedding(
            n_harmonic_functions=self.n_harmonic_functions,
            append_input=self.append_input,
        )

    def get_encoding_dim(self) -> int:
        # static (config-only) — must work outside init/apply, where setup
        # attributes are unreachable
        return HarmonicEmbedding.get_output_dim_static(
            1, self.n_harmonic_functions, self.append_input
        )

    def __call__(self, frame_timestamp=None, sequence_name=None, **kwargs):
        if frame_timestamp is None:
            raise ValueError("HarmonicTimeEncoder requires frame_timestamp")
        t = jnp.asarray(frame_timestamp, jnp.float32).reshape(-1, 1)
        return self._harmonic_embedding(t / self.time_divisor)
