"""Batched 3D transforms (parity: reference transforms/transform3d.py).

``Transform3d`` is an immutable pytree wrapping a batch of 4x4 matrices in
the row-vector convention used throughout the framework::

    [x' y' z' 1] = [x y z 1] @ M,    M = [[Rxx, Rxy, Rxz, 0],
                                          [Ryx, Ryy, Ryz, 0],
                                          [Rzx, Rzy, Rzz, 0],
                                          [Tx,  Ty,  Tz,  1]]

Unlike the reference (which keeps a lazy list of sub-transforms and composes
on demand), composition here is an eager matmul: under jit XLA fuses the
chain, so laziness buys nothing on TPU and immutability keeps the class a
valid pytree for sharding/vmapping.
"""

from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

from .rotation_conversions import _axis_angle_rotation


def _broadcast_bmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul broadcasting batch dims of size 1 on either side."""
    if a.ndim == 2:
        a = a[None]
    if len(a) != len(b):
        if not ((len(a) == 1) or (len(b) == 1)):
            raise ValueError(
                f"Expected batch dims to be broadcastable, got {len(a)}, {len(b)}."
            )
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


@struct.dataclass
class Transform3d:
    """A batch of N 4x4 transform matrices (row-vector convention).

    `Transform3d()` (no args) is the identity, like the reference.
    """

    matrix: jnp.ndarray = None  # (N, 4, 4)

    def __post_init__(self):
        if self.matrix is None:
            object.__setattr__(self, "matrix", jnp.eye(4, dtype=jnp.float32)[None])

    @classmethod
    def create(
        cls,
        matrix: Optional[jnp.ndarray] = None,
        dtype=jnp.float32,
    ) -> "Transform3d":
        if matrix is None:
            matrix = jnp.eye(4, dtype=dtype)[None]
        else:
            matrix = jnp.asarray(matrix, dtype=dtype)
            if matrix.ndim not in (2, 3):
                raise ValueError('"matrix" has to be a 2- or a 3-dimensional tensor.')
            if matrix.shape[-2:] != (4, 4):
                raise ValueError(
                    '"matrix" has to be a tensor of shape (minibatch, 4, 4) or (4, 4).'
                )
            if matrix.ndim == 2:
                matrix = matrix[None]
        return cls(matrix=matrix)

    def __len__(self) -> int:
        return self.matrix.shape[0]

    def __getitem__(self, index) -> "Transform3d":
        if isinstance(index, int):
            index = slice(index, index + 1) if index != -1 else slice(-1, None)
        return Transform3d(matrix=self.matrix[index])

    @property
    def dtype(self):
        return self.matrix.dtype

    def get_matrix(self) -> jnp.ndarray:
        """The (N, 4, 4) composed matrix."""
        return self.matrix

    def get_se3_log(self, eps: float = 1e-4, cos_bound: float = 1e-4) -> jnp.ndarray:
        from .se3 import se3_log_map

        return se3_log_map(self.matrix, eps=eps, cos_bound=cos_bound)

    def compose(self, *others: "Transform3d") -> "Transform3d":
        """Return self followed by each transform in ``others`` (left to right)."""
        m = self.matrix
        for other in others:
            m = _broadcast_bmm(m, other.matrix)
        return Transform3d(matrix=m)

    def inverse(self, invert_composed: bool = False) -> "Transform3d":
        """Inverse transform (``invert_composed`` kept for API parity)."""
        return Transform3d(matrix=jnp.linalg.inv(self.matrix))

    def stack(self, *others: "Transform3d") -> "Transform3d":
        mats = [self.matrix] + [o.matrix for o in others]
        return Transform3d(matrix=jnp.concatenate(mats, axis=0))

    def transform_points(
        self, points: jnp.ndarray, eps: Optional[float] = None
    ) -> jnp.ndarray:
        """Transform points of shape (P, 3) or (N, P, 3).

        ``eps`` clamps |w| of the homogeneous output away from zero
        (sign-preserving) before the perspective divide.
        """
        points_batch = points
        if points_batch.ndim == 2:
            points_batch = points_batch[None]
        if points_batch.ndim != 3 or points_batch.shape[-1] != 3:
            raise ValueError(
                f"Expected points of shape (P, 3) or (N, P, 3); got {points.shape}."
            )
        N, P, _3 = points_batch.shape
        ones = jnp.ones((N, P, 1), dtype=points_batch.dtype)
        points_h = jnp.concatenate([points_batch, ones], axis=2)
        points_out = _broadcast_bmm(points_h, self.matrix)
        denom = points_out[..., 3:]
        if eps is not None:
            denom_sign = jnp.where(denom >= 0.0, 1.0, -1.0)
            denom = denom_sign * jnp.maximum(jnp.abs(denom), eps)
        points_out = points_out[..., :3] / denom
        if points.ndim == 2 and points_out.shape[0] == 1:
            points_out = points_out[0]
        return points_out

    def transform_normals(self, normals: jnp.ndarray) -> jnp.ndarray:
        """Transform normals (P, 3) or (N, P, 3) by the inverse transpose."""
        if normals.ndim not in (2, 3) or normals.shape[-1] != 3:
            raise ValueError(
                f"Expected normals of shape (P, 3) or (N, P, 3); got {normals.shape}."
            )
        # Normals transform by the inverse-transpose of the 3x3 block:
        # n' = n @ inv(m)^T.
        composed = self.matrix
        mat = jnp.transpose(jnp.linalg.inv(composed[:, :3, :3]), (0, 2, 1))
        normals_batch = normals[None] if normals.ndim == 2 else normals
        normals_out = _broadcast_bmm(normals_batch, mat)
        if normals.ndim == 2 and normals_out.shape[0] == 1:
            normals_out = normals_out[0]
        return normals_out

    def translate(self, *args, **kwargs) -> "Transform3d":
        return self.compose(Translate(*args, dtype=self.dtype, **kwargs))

    def scale(self, *args, **kwargs) -> "Transform3d":
        return self.compose(Scale(*args, dtype=self.dtype, **kwargs))

    def rotate(self, *args, **kwargs) -> "Transform3d":
        return self.compose(Rotate(*args, dtype=self.dtype, **kwargs))

    def rotate_axis_angle(self, *args, **kwargs) -> "Transform3d":
        return self.compose(RotateAxisAngle(*args, dtype=self.dtype, **kwargs))

    def clone(self) -> "Transform3d":
        return Transform3d(matrix=self.matrix)

    # Device-movement no-ops kept for API familiarity.
    def to(self, *args, **kwargs) -> "Transform3d":
        return self

    def cpu(self) -> "Transform3d":
        return self


def _handle_coord(c, dtype) -> jnp.ndarray:
    c = jnp.asarray(c, dtype=dtype)
    if c.ndim == 0:
        c = c.reshape(1)
    return c


def _handle_input(
    x, y, z, dtype, name: str, allow_singleton: bool = False
) -> jnp.ndarray:
    """Normalize (x, y, z) ctor args to an (N, 3) array (reference semantics)."""
    x = jnp.asarray(x) if not isinstance(x, (int, float)) else x
    if isinstance(x, jnp.ndarray) and x.ndim == 2:
        if x.shape[1] != 3:
            raise ValueError(f"Expected tensor of shape (N, 3); got {x.shape} ({name})")
        if y is not None or z is not None:
            raise ValueError(f"Expected y and z to be None ({name})")
        return x.astype(dtype)

    if allow_singleton and y is None and z is None:
        y = x
        z = x

    xyz = [_handle_coord(c, dtype) for c in [x, y, z]]
    sizes = [c.shape[0] for c in xyz]
    N = max(sizes)
    for c in xyz:
        if c.shape[0] != 1 and c.shape[0] != N:
            raise ValueError(f"Got non-broadcastable sizes {sizes} ({name})")
    xyz = [jnp.broadcast_to(c, (N,)) for c in xyz]
    return jnp.stack(xyz, axis=1)


def Translate(x, y=None, z=None, dtype=jnp.float32) -> Transform3d:
    """Translation transform from per-axis offsets or an (N, 3) tensor."""
    xyz = _handle_input(x, y, z, dtype, "Translate")
    N = xyz.shape[0]
    mat = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (N, 4, 4))
    mat = mat.at[:, 3, :3].set(xyz)
    return Transform3d(matrix=mat)


def Scale(x, y=None, z=None, dtype=jnp.float32) -> Transform3d:
    """Scale transform; a single scalar scales isotropically."""
    xyz = _handle_input(x, y, z, dtype, "scale", allow_singleton=True)
    N = xyz.shape[0]
    mat = jnp.zeros((N, 4, 4), dtype=dtype)
    mat = mat.at[:, 0, 0].set(xyz[:, 0])
    mat = mat.at[:, 1, 1].set(xyz[:, 1])
    mat = mat.at[:, 2, 2].set(xyz[:, 2])
    mat = mat.at[:, 3, 3].set(1.0)
    return Transform3d(matrix=mat)


def Rotate(
    R: jnp.ndarray, dtype=jnp.float32, orthogonal_tol: float = 1e-5
) -> Transform3d:
    """Rotation transform from (3, 3) or (N, 3, 3) row-vector matrices."""
    R = jnp.asarray(R, dtype=dtype)
    if R.ndim == 2:
        R = R[None]
    if R.shape[-2:] != (3, 3):
        raise ValueError("R must have shape (3, 3) or (N, 3, 3)")
    N = R.shape[0]
    mat = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (N, 4, 4))
    mat = mat.at[:, :3, :3].set(R)
    return Transform3d(matrix=mat)


def RotateAxisAngle(
    angle,
    axis: str = "X",
    degrees: bool = True,
    dtype=jnp.float32,
) -> Transform3d:
    """Rotation about a named axis by batched angles.

    Matches the reference's convention of transposing the axis rotation so
    that it rotates row-vector points counterclockwise about the axis.
    """
    axis = axis.upper()
    if axis not in ["X", "Y", "Z"]:
        raise ValueError("Expected axis to be one of ['X', 'Y', 'Z']; got %s" % axis)
    angle = _handle_coord(angle, dtype)
    if degrees:
        angle = angle * (math.pi / 180.0)
    R = _axis_angle_rotation(axis, angle)
    return Rotate(R=jnp.swapaxes(R, -1, -2), dtype=dtype)
