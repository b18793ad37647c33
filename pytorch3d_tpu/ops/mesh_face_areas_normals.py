"""Per-face areas and normals (reference ops/mesh_face_areas_normals.py:15 +
csrc/face_areas_normals/, 606 LoC).

Pure vectorized VPU math; the custom CUDA backward becomes XLA autodiff.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..common.math_utils import safe_norm


def mesh_face_areas_normals(
    verts: jnp.ndarray, faces: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """verts (V, 3), faces (F, 3) int -> (areas (F,), normals (F, 3)).

    Faces with id -1 (padding) produce area 0 / normal 0.
    """
    valid = jnp.all(faces >= 0, axis=-1)
    f = jnp.maximum(faces, 0)
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    norm = safe_norm(n, axis=-1)
    areas = 0.5 * norm
    ok = norm > 0
    normals = n * jnp.where(ok, 1.0 / jnp.where(ok, norm, 1.0), 0.0)[:, None]
    areas = jnp.where(valid, areas, 0.0)
    normals = jnp.where(valid[:, None], normals, 0.0)
    return areas, normals
