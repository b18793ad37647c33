"""Fit circles to 3D point sequences (camera trajectories).

Parity: reference implicitron/tools/circle_fitting.py (`fit_circle_in_3d`,
`fit_circle_in_2d`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class Circle2D:
    center: jnp.ndarray  # (2,)
    radius: jnp.ndarray  # ()
    generated_points: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class Circle3D:
    center: jnp.ndarray  # (3,)
    radius: jnp.ndarray  # ()
    normal: jnp.ndarray  # (3,)
    generated_points: Optional[jnp.ndarray] = None


def fit_circle_in_2d(
    points2d: jnp.ndarray, n_points: int = 0, angles: Optional[jnp.ndarray] = None
) -> Circle2D:
    """Least-squares circle fit (Coope's method, reference)."""
    P = points2d
    A = jnp.concatenate([2.0 * P, jnp.ones((P.shape[0], 1), P.dtype)], axis=1)
    b = jnp.sum(P * P, axis=1)
    sol, *_ = jnp.linalg.lstsq(A, b[:, None])
    center = sol[:2, 0]
    radius = jnp.sqrt(sol[2, 0] + jnp.sum(center**2))
    generated = None
    if n_points > 0 or angles is not None:
        if angles is None:
            angles = jnp.linspace(0, 2 * jnp.pi, n_points, endpoint=False)
        generated = center + radius * jnp.stack(
            [jnp.cos(angles), jnp.sin(angles)], axis=-1
        )
    return Circle2D(center=center, radius=radius, generated_points=generated)


def fit_circle_in_3d(
    points: jnp.ndarray,
    n_points: int = 0,
    angles: Optional[jnp.ndarray] = None,
    offset: Optional[jnp.ndarray] = None,
    up: Optional[jnp.ndarray] = None,
) -> Circle3D:
    """Fit a circle to 3D points: plane by PCA, then 2D fit (reference)."""
    centroid = jnp.mean(points, axis=0)
    centered = points - centroid
    _, _, Vt = jnp.linalg.svd(centered, full_matrices=False)
    normal = Vt[2]
    if up is not None:
        normal = normal * jnp.sign(jnp.dot(normal, up))
    basis = Vt[:2]  # (2, 3)
    pts2d = centered @ basis.T
    c2d = fit_circle_in_2d(pts2d, n_points=n_points, angles=angles)
    center3d = centroid + c2d.center @ basis
    generated = None
    if c2d.generated_points is not None:
        generated = centroid + c2d.generated_points @ basis
        if offset is not None:
            generated = generated + offset
    return Circle3D(
        center=center3d, radius=c2d.radius, normal=normal,
        generated_points=generated,
    )


def get_rotation_to_best_fit_xy(
    points: jnp.ndarray, centroid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Rotation R such that `points @ R` has its best-fit plane parallel
    to xy (reference circle_fitting.py:17): the two largest principal
    directions become x/y and their cross product z (right-handed)."""
    if centroid is None:
        centroid = points.mean(axis=-2, keepdims=True)
    centered = points - centroid
    cov = jnp.swapaxes(centered, -1, -2) @ centered
    _, evec = jnp.linalg.eigh(cov)  # ascending eigenvalues
    return jnp.concatenate(
        [
            evec[..., 1:],
            jnp.cross(evec[..., 1], evec[..., 2])[..., None],
        ],
        axis=-1,
    )
