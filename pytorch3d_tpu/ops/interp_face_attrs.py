"""Barycentric interpolation of per-face-vertex attributes to pixels.

Parity: reference ops/interp_face_attrs.py:15 + csrc/interp_face_attrs/.
On TPU this is a gather + weighted sum; XLA's gather transpose provides the
backward (the reference needs a dedicated CUDA kernel).
"""

from __future__ import annotations

import jax.numpy as jnp


def interpolate_face_attributes(
    pix_to_face: jnp.ndarray,  # (N, H, W, K) packed face ids, -1 = empty
    barycentric_coords: jnp.ndarray,  # (N, H, W, K, 3)
    face_attributes: jnp.ndarray,  # (F_total, 3, D)
) -> jnp.ndarray:
    """Interpolate per-vertex attributes with barycentric weights.

    Returns (N, H, W, K, D); empty pixels are 0.
    """
    if face_attributes.ndim != 3 or face_attributes.shape[1] != 3:
        raise ValueError("face_attributes must have shape (F, 3, D)")
    sel = jnp.maximum(pix_to_face, 0)
    attrs = face_attributes[sel]  # (N, H, W, K, 3, D)
    vals = jnp.sum(barycentric_coords[..., None] * attrs, axis=-2)
    mask = (pix_to_face >= 0)[..., None]
    return jnp.where(mask, vals, 0.0)


def interpolate_face_attributes_python(pix_to_face, barycentric_coords, face_attributes):
    """Alias kept for test parity with the reference naming."""
    return interpolate_face_attributes(pix_to_face, barycentric_coords, face_attributes)
