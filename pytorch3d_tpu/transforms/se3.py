"""SE(3) exp/log maps (parity: reference transforms/se3.py).

SE(3) matrices use the row-vector convention::

    [ R 0 ]
    [ T 1 ]

and the 6D log representation is ``[log_translation | log_rotation]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .so3 import _so3_exp_map, hat, so3_log_map


def _se3_V_matrix(
    log_rotation: jnp.ndarray,
    log_rotation_hat: jnp.ndarray,
    log_rotation_hat_square: jnp.ndarray,
    rotation_angles: jnp.ndarray,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """The "V" (left Jacobian) matrix: V = I + A·hat + B·hat², with
    A = (1 - cos θ)/θ² and B = (θ - sin θ)/θ³."""
    theta = rotation_angles
    theta2 = jnp.square(theta)
    A = (1.0 - jnp.cos(theta)) / theta2
    B = (theta - jnp.sin(theta)) / (theta2 * theta)
    eye = jnp.eye(3, dtype=log_rotation.dtype)
    return (
        eye
        + A[..., None, None] * log_rotation_hat
        + B[..., None, None] * log_rotation_hat_square
    )


def _get_se3_V_input(log_rotation: jnp.ndarray, eps: float = 1e-4):
    nrms = jnp.sum(log_rotation * log_rotation, axis=-1)
    rotation_angles = jnp.sqrt(jnp.maximum(nrms, eps))
    log_rotation_hat = hat(log_rotation)
    log_rotation_hat_square = jnp.matmul(
        log_rotation_hat, log_rotation_hat, precision=jax.lax.Precision.HIGHEST
    )
    return log_rotation, log_rotation_hat, log_rotation_hat_square, rotation_angles


def se3_exp_map(log_transform: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3), (N, 6) -> (N, 4, 4) row-vector mats."""
    if log_transform.ndim != 2 or log_transform.shape[1] != 6:
        raise ValueError("Expected input to be of shape (N, 6).")
    N = log_transform.shape[0]
    log_translation = log_transform[..., :3]
    log_rotation = log_transform[..., 3:]

    R, rotation_angles, log_rotation_hat, log_rotation_hat_square = _so3_exp_map(
        log_rotation, eps=eps
    )
    V = _se3_V_matrix(
        log_rotation, log_rotation_hat, log_rotation_hat_square, rotation_angles,
        eps=eps,
    )
    T = jnp.einsum("nij,nj->ni", V, log_translation,
                   precision=jax.lax.Precision.HIGHEST)

    transform = jnp.zeros((N, 4, 4), dtype=log_transform.dtype)
    transform = transform.at[:, :3, :3].set(R)
    transform = transform.at[:, :3, 3].set(T)
    transform = transform.at[:, 3, 3].set(1.0)
    # Row-vector convention: transpose so translation is the last row.
    return jnp.transpose(transform, (0, 2, 1))


def se3_log_map(
    transform: jnp.ndarray, eps: float = 1e-4, cos_bound: float = 1e-4
) -> jnp.ndarray:
    """Logarithm map SE(3) -> se(3), (N, 4, 4) -> (N, 6)."""
    if transform.ndim != 3 or transform.shape[-2:] != (4, 4):
        raise ValueError("Input tensor shape has to be (N, 4, 4).")
    R = jnp.transpose(transform[:, :3, :3], (0, 2, 1))
    log_rotation = so3_log_map(R, eps=eps, cos_bound=cos_bound)
    T = transform[:, 3, :3]
    V = _se3_V_matrix(*_get_se3_V_input(log_rotation, eps=eps), eps=eps)
    log_translation = jnp.linalg.solve(V, T[..., None])[..., 0]
    return jnp.concatenate((log_translation, log_rotation), axis=1)
