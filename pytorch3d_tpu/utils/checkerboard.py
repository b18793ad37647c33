"""Checkerboard mesh primitive (reference utils/checkerboard.py:18)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..renderer.mesh.textures import TexturesAtlas
from ..structures.meshes import Meshes


def checkerboard(
    radius: int = 4,
    color1: Tuple[float, ...] = (0.0, 0.0, 0.0),
    color2: Tuple[float, ...] = (1.0, 1.0, 1.0),
) -> Meshes:
    """A 2*radius x 2*radius checkerboard in the z=0 plane with a two-color
    per-face texture atlas."""
    side = 2 * radius
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([X, Y, np.zeros_like(X)], axis=-1).reshape(-1, 3)
    V = side + 1
    faces = []
    colors = []
    for i in range(side):
        for j in range(side):
            v00 = i * V + j
            v01 = v00 + 1
            v10 = v00 + V
            v11 = v10 + 1
            faces.append((v00, v10, v11))
            faces.append((v00, v11, v01))
            c = color1 if (i + j) % 2 == 0 else color2
            colors.extend([c, c])
    atlas = jnp.asarray(np.asarray(colors, np.float32))[:, None, None, :]
    tex = TexturesAtlas.create(atlas[None])
    return Meshes.create(
        [jnp.asarray(verts)], [jnp.asarray(np.asarray(faces, np.int32))],
        textures=tex,
    )
