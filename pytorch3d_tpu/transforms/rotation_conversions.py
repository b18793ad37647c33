"""Rotation representation conversions (JAX).

API parity with the reference `pytorch3d/transforms/rotation_conversions.py`
(quaternions are real-part-first ``(w, x, y, z)``; euler conventions are
strings of axis letters composed as ``R = R(c0) @ R(c1) @ R(c2)``).

All functions are pure jnp, batched over arbitrary leading dims, and safe
under jit / grad (no data-dependent Python control flow).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x <= 0."""
    positive = x > 0
    safe_x = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe_x), 0.0)


def _copysign(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Magnitudes of ``a`` with the signs of ``b`` (sign(0) treated as +)."""
    return jnp.where(b < 0, -jnp.abs(a), jnp.abs(a))


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions (..., 4), real part first, to matrices (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to quaternions (..., 4), w first.

    Uses the numerically robust four-candidate construction: build the
    quaternion from each of the four diagonal combinations and select the
    candidate with the largest denominator.
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternion per row r/i/j/k as the "large" component.
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    # Clip denominators away from zero for gradient safety; the selected
    # candidate always has denominator >= 0.5 for a valid rotation.
    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)
    out = jnp.sum(quat_candidates * onehot[..., None], axis=-2)
    return standardize_quaternion(out)


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Flip quaternions so the real part is non-negative."""
    return jnp.where(quaternions[..., 0:1] < 0, -quaternions, quaternions)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two quaternion arrays (..., 4)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack([ow, ox, oy, oz], axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Quaternion product, standardized to non-negative real part."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Inverse (conjugate) of unit quaternions."""
    return quaternion * jnp.asarray([1, -1, -1, -1], dtype=quaternion.dtype)


def quaternion_apply(quaternion: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate points (..., 3) by unit quaternions (..., 4)."""
    if point.shape[-1] != 3:
        raise ValueError(f"Points are not in 3D, {point.shape}.")
    real_parts = jnp.zeros(point.shape[:-1] + (1,), dtype=point.dtype)
    point_as_quaternion = jnp.concatenate([real_parts, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, point_as_quaternion),
        quaternion_invert(quaternion),
    )
    return out[..., 1:]


def _axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about a named axis ('X' | 'Y' | 'Z')."""
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)

    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("letter must be either X, Y or Z.")

    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Euler angles (..., 3) in radians to matrices, given e.g. "XYZ"."""
    if euler_angles.ndim == 0 or euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    m01 = jnp.matmul(matrices[0], matrices[1], precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(m01, matrices[2], precision=jax.lax.Precision.HIGHEST)


def _index_from_letter(letter: str) -> int:
    if letter == "X":
        return 0
    if letter == "Y":
        return 1
    if letter == "Z":
        return 2
    raise ValueError("letter must be either X, Y or Z.")


def _angle_from_tan(
    axis: str, other_axis: str, data: jnp.ndarray, horizontal: bool, tait_bryan: bool
) -> jnp.ndarray:
    """Extract the first or third euler angle from a matrix slice via atan2."""
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Matrices (..., 3, 3) to euler angles (..., 3) for the given convention."""
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")
    if matrix.ndim < 2 or matrix.shape[-2:] != (3, 3):
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central_angle = jnp.arcsin(
            jnp.clip(
                matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0),
                -1.0,
                1.0,
            )
        )
    else:
        central_angle = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))

    o = (
        _angle_from_tan(
            convention[0], convention[1], matrix[..., i2], False, tait_bryan
        ),
        central_angle,
        _angle_from_tan(
            convention[2], convention[1], matrix[..., i0, :], True, tait_bryan
        ),
    )
    return jnp.stack(o, axis=-1)


def random_quaternions(
    n: int, key: Optional[jax.Array] = None, dtype=jnp.float32
) -> jnp.ndarray:
    """n random unit quaternions with non-negative real part."""
    if key is None:
        key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (n, 4), dtype=dtype)
    s = jnp.sum(o * o, axis=1, keepdims=True)
    o = o / _copysign(jnp.sqrt(s), o[:, 0:1])
    return o


def random_rotations(
    n: int, key: Optional[jax.Array] = None, dtype=jnp.float32
) -> jnp.ndarray:
    """n uniformly-random rotation matrices (n, 3, 3)."""
    quaternions = random_quaternions(n, key=key, dtype=dtype)
    return quaternion_to_matrix(quaternions)


def random_rotation(key: Optional[jax.Array] = None, dtype=jnp.float32) -> jnp.ndarray:
    """A single random rotation matrix (3, 3)."""
    return random_rotations(1, key=key, dtype=dtype)[0]


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors (..., 3) to quaternions (..., 4), w first.

    Uses a 4th-order Taylor expansion of sin(x/2)/x near zero so the map is
    smooth (and grad-safe) at the identity.
    """
    angles2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small_angles = angles2 < 1e-12
    safe_angles2 = jnp.where(small_angles, 1.0, angles2)
    angles = jnp.sqrt(safe_angles2)
    half_angles = angles * 0.5
    sin_half_angles_over_angles = jnp.where(
        small_angles,
        0.5 - angles2 / 48.0,
        jnp.sin(half_angles) / angles,
    )
    cos_half = jnp.where(small_angles, 1.0 - angles2 / 8.0, jnp.cos(half_angles))
    return jnp.concatenate(
        [cos_half, axis_angle * sin_half_angles_over_angles], axis=-1
    )


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Quaternions (..., 4), w first, to axis-angle vectors (..., 3)."""
    norms2 = jnp.sum(
        quaternions[..., 1:] * quaternions[..., 1:], axis=-1, keepdims=True
    )
    small = norms2 < 1e-12
    norms = jnp.sqrt(jnp.where(small, 1.0, norms2))
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    sin_half_angles_over_angles = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / angles,
    )
    # At the identity (zero imaginary part) the axis-angle is exactly zero.
    out = quaternions[..., 1:] / sin_half_angles_over_angles
    return jnp.where(small, quaternions[..., 1:] * 2.0, out)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) to rotation matrices via Rodrigues' formula.

    R = I + sin(t) K + (1 - cos(t)) K^2 with K = hat(axis).  The sin(t)/t and
    (1-cos t)/t^2 factors use Taylor fallbacks near t = 0 for grad safety.
    """
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1)
    small = theta2 < 1e-10
    # Substitute a safe value into the non-selected branch so its derivative
    # stays finite (0 * inf = NaN otherwise under jnp.where-of-grads).
    safe_theta2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_theta2)
    # sin(t)/t and (1 - cos t)/t^2 with series fallbacks.
    sin_over = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    one_minus_cos_over2 = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_theta2
    )
    x, y, z = jnp.moveaxis(axis_angle, -1, 0)
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(axis_angle.shape[:-1] + (3, 3))
    K2 = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    return (
        eye
        + sin_over[..., None, None] * K
        + one_minus_cos_over2[..., None, None] * K2
    )


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) to axis-angle vectors (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (Zhou et al, CVPR 2019) to matrices.

    Gram-Schmidt-orthonormalizes the two 3-vectors in ``d6`` into the first
    two rows of the rotation matrix; the third row is their cross product.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Matrices (..., 3, 3) to the 6D representation (first two rows)."""
    batch_dim = matrix.shape[:-2]
    return matrix[..., :2, :].reshape(batch_dim + (6,))
