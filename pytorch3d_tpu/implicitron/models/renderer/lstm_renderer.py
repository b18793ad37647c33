"""LSTM ray marcher (Scene Representation Networks).

Parity: reference implicitron/models/renderer/lstm_renderer.py:24
(`LSTMRenderer`): an LSTM cell predicts per-ray step sizes; after
`num_raymarch_steps` the feature at the final point is decoded to color.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...tools.config import registry
from .base import BaseRenderer, EvaluationMode, ImplicitronRayBundle, RendererOutput


class _LSTMCore(nn.Module):
    hidden_size: int = 16

    @nn.compact
    def __call__(self, x, state):
        cell = nn.OptimizedLSTMCell(self.hidden_size, name="lstm")
        state, y = cell(state, x)
        signal = nn.Dense(1, name="out")(y)
        return signal, state


@registry.register
@dataclasses.dataclass
class LSTMRenderer(BaseRenderer):
    num_raymarch_steps: int = 10
    init_depth: float = 17.0
    init_depth_noise_std: float = 5e-4
    hidden_size: int = 16
    n_feature_channels: int = 256
    verbose: bool = False

    def __post_init__(self):
        self._lstm = _LSTMCore(hidden_size=self.hidden_size)

    @property
    def flax_module_kwarg(self) -> str:
        return "lstm_module"

    @property
    def flax_module(self) -> nn.Module:
        """The renderer's learnable core.  GenericModel adopts this module
        into its own flax scope (setup assigns it to an attribute) and feeds
        the bound instance back via `lstm_module=` so the LSTM trains with
        the rest of the model."""
        return self._lstm

    def __call__(
        self,
        ray_bundle: ImplicitronRayBundle,
        implicit_functions: List = (),
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        lstm_params=None,
        lstm_module: Optional[nn.Module] = None,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> RendererOutput:
        """March rays with LSTM-predicted steps.

        `implicit_functions[0]` must map world points (..., 3) to features
        (..., n_feature_channels) and expose `raymarch` features; the last
        function decodes features to (density, color) — per reference, a
        single SRN field provides both via flags.
        """
        if not implicit_functions:
            raise ValueError("LSTM renderer expects an implicit function")
        fn = implicit_functions[0]
        decoder = implicit_functions[-1]

        origins = ray_bundle.origins
        dirs = ray_bundle.directions
        spatial = origins.shape[:-1]
        o = origins.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        M = o.shape[0]
        if key is None:
            key = jax.random.PRNGKey(0)

        depth = jnp.full((M, 1), self.init_depth) + (
            jax.random.normal(key, (M, 1)) * self.init_depth_noise_std
        )

        # materialize the field's parameters with a warm-up call (flax
        # creates params at first call)
        feats0 = fn(o + depth * d)
        # zero (c, h) carry, built by hand: constructing an LSTMCell here
        # would trip flax's AssignSubModuleError when running inside
        # GenericModel's method scope
        zeros = jnp.zeros(feats0.shape[:-1] + (self.hidden_size,), feats0.dtype)
        carry = (zeros, zeros)

        if lstm_module is not None:
            # bound submodule adopted by GenericModel — trains with the model
            step = lstm_module
        else:
            if lstm_params is None:
                # standalone use: hold params locally (not trainable here)
                lstm_params = self._lstm.init(key, feats0, carry)
            step = lambda f, c: self._lstm.apply(lstm_params, f, c)

        for _ in range(self.num_raymarch_steps):
            feats = fn(o + depth * d)
            signal, carry = step(feats, carry)
            depth = depth + signal

        pts = o + depth * d
        feats = fn(pts)
        rgb = decoder(feats) if decoder is not fn else feats[..., :3]
        mask = jnp.ones_like(depth)
        return RendererOutput(
            features=rgb.reshape(spatial + (-1,)),
            depths=depth.reshape(spatial + (1,)),
            masks=mask.reshape(spatial + (1,)),
        )
