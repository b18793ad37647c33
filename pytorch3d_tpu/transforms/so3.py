"""SO(3) Lie group utilities (parity: reference transforms/so3.py).

Rotation matrices follow the reference's row-vector convention everywhere in
the package: points transform as ``x' = x @ R``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .math import acos_linear_extrapolation
from .rotation_conversions import axis_angle_to_matrix, matrix_to_axis_angle


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Hat operator: 3-vectors (..., 3) to skew matrices (..., 3, 3)."""
    if v.shape[-1] != 3:
        raise ValueError("Input vectors have to be 3-dimensional.")
    x, y, z = jnp.moveaxis(v, -1, 0)
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def hat_inv(h: jnp.ndarray) -> jnp.ndarray:
    """Inverse hat operator: skew matrices (..., 3, 3) to vectors (..., 3).

    Note: unlike the reference this does not raise on non-skew input (a
    traced check would not be jittable); it reads the lower-triangle entries.
    """
    if h.shape[-2:] != (3, 3):
        raise ValueError("Input has to be a batch of 3x3 Tensors.")
    x = h[..., 2, 1]
    y = h[..., 0, 2]
    z = h[..., 1, 0]
    return jnp.stack((x, y, z), axis=-1)


def so3_rotation_angle(
    R: jnp.ndarray,
    eps: float = 1e-4,
    cos_angle: bool = False,
    cos_bound: float = 1e-4,
) -> jnp.ndarray:
    """Rotation angle of matrices via acos(0.5 (trace - 1)).

    ``cos_bound > 0`` uses linear extrapolation of acos near +-1 so outputs
    and gradients stay finite near 0 and pi.
    """
    if R.shape[-2:] != (3, 3):
        raise ValueError("Input has to be a batch of 3x3 Tensors.")
    rot_trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    phi_cos = (rot_trace - 1.0) * 0.5
    if cos_angle:
        return phi_cos
    if cos_bound > 0.0:
        bound = 1.0 - cos_bound
        return acos_linear_extrapolation(phi_cos, (-bound, bound))
    return jnp.arccos(jnp.clip(phi_cos, -1.0, 1.0))


def so3_relative_angle(
    R1: jnp.ndarray,
    R2: jnp.ndarray,
    cos_angle: bool = False,
    cos_bound: float = 1e-4,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """Geodesic angle between pairs of rotations: angle(R1 @ R2^T)."""
    R12 = jnp.matmul(R1, jnp.swapaxes(R2, -1, -2), precision=jax.lax.Precision.HIGHEST)
    return so3_rotation_angle(R12, cos_angle=cos_angle, cos_bound=cos_bound, eps=eps)


def _so3_exp_map(
    log_rot: jnp.ndarray, eps: float = 0.0001
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exp map plus the intermediates reused by se3_exp_map."""
    if log_rot.shape[-1] != 3:
        raise ValueError("Input tensor shape has to be Nx3.")
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.maximum(nrms, eps))
    skews = hat(log_rot)
    skews_square = jnp.matmul(skews, skews, precision=jax.lax.Precision.HIGHEST)
    R = axis_angle_to_matrix(log_rot)
    return R, rot_angles, skews, skews_square


def so3_exp_map(log_rot: jnp.ndarray, eps: float = 0.0001) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) (Rodrigues' formula)."""
    return _so3_exp_map(log_rot, eps=eps)[0]


def so3_exponential_map(
    log_rot: jnp.ndarray, eps: float = 0.0001
) -> jnp.ndarray:
    """DEPRECATED alias of so3_exp_map (reference so3.py:140)."""
    import warnings

    warnings.warn(
        "so3_exponential_map is deprecated, use so3_exp_map instead.",
        PendingDeprecationWarning,
    )
    return so3_exp_map(log_rot, eps)


def so3_log_map(
    R: jnp.ndarray, eps: float = 0.0001, cos_bound: float = 1e-4
) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3), via the quaternion route (grad-safe)."""
    if R.shape[-2:] != (3, 3):
        raise ValueError("Input has to be a batch of 3x3 Tensors.")
    return matrix_to_axis_angle(R)
