"""Harmonic (positional/NeRF) embedding.

Parity: reference renderer/implicit/harmonic_embedding.py:14.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


class HarmonicEmbedding:
    """[sin(2^i x), cos(2^i x)] frequency features (reference :14)."""

    def __init__(
        self,
        n_harmonic_functions: int = 6,
        omega_0: float = 1.0,
        logspace: bool = True,
        append_input: bool = True,
    ) -> None:
        if logspace:
            frequencies = 2.0 ** jnp.arange(n_harmonic_functions, dtype=jnp.float32)
        else:
            frequencies = jnp.linspace(
                1.0,
                2.0 ** (n_harmonic_functions - 1),
                n_harmonic_functions,
                dtype=jnp.float32,
            )
        self._frequencies = frequencies * omega_0
        self.append_input = append_input
        self.n_harmonic_functions = n_harmonic_functions

    def __call__(self, x: jnp.ndarray, diag_cov: Optional[jnp.ndarray] = None,
                 eps: float = 1e-6) -> jnp.ndarray:
        """x (..., D) -> (..., D * 2 * n_harmonics [+ D])."""
        embed = x[..., None] * self._frequencies  # (..., D, F)
        embed = embed.reshape(x.shape[:-1] + (-1,))
        if diag_cov is None:
            out = jnp.concatenate([jnp.sin(embed), jnp.cos(embed)], axis=-1)
        else:
            # integrated positional encoding (mip-NeRF style, reference :126)
            scale = (diag_cov[..., None] * (self._frequencies**2)).reshape(
                x.shape[:-1] + (-1,)
            )
            atten = jnp.exp(-0.5 * scale)
            out = jnp.concatenate(
                [jnp.sin(embed) * atten, jnp.cos(embed) * atten], axis=-1
            )
        if self.append_input:
            out = jnp.concatenate([out, x], axis=-1)
        return out

    @staticmethod
    def get_output_dim_static(
        input_dims: int, n_harmonic_functions: int, append_input: bool
    ) -> int:
        return input_dims * (2 * n_harmonic_functions + int(append_input))

    def get_output_dim(self, input_dims: int = 3) -> int:
        return self.get_output_dim_static(
            input_dims, self.n_harmonic_functions, self.append_input
        )
