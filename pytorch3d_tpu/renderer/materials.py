"""Materials (parity: reference renderer/materials.py:16)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


def _color_batch(c) -> jnp.ndarray:
    c = jnp.asarray(c, jnp.float32)
    if c.ndim == 1:
        c = c[None]
    return c


@struct.dataclass
class Materials:
    """Batched Phong material properties."""

    ambient_color: jnp.ndarray = None  # (N, 3)
    diffuse_color: jnp.ndarray = None  # (N, 3)
    specular_color: jnp.ndarray = None  # (N, 3)
    shininess: jnp.ndarray = None  # (N,)

    @classmethod
    def create(
        cls,
        ambient_color=((1, 1, 1),),
        diffuse_color=((1, 1, 1),),
        specular_color=((1, 1, 1),),
        shininess=64,
    ) -> "Materials":
        shininess = jnp.asarray(shininess, jnp.float32)
        if shininess.ndim == 0:
            shininess = shininess[None]
        return cls(
            ambient_color=_color_batch(ambient_color),
            diffuse_color=_color_batch(diffuse_color),
            specular_color=_color_batch(specular_color),
            shininess=shininess,
        )

    def __len__(self) -> int:
        return self.ambient_color.shape[0]

    def clone(self) -> "Materials":
        return self
