"""Point cloud normal / local-frame estimation via per-point PCA.

Parity: reference ops/points_normals.py:21 (`estimate_pointcloud_normals`),
:67 (`estimate_pointcloud_local_coord_frames`).  Uses the closed-form
symeig3x3 (common/symeig3x3.py) — batched on the VPU, no LAPACK.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

from ..common.symeig3x3 import symeig3x3
from .utils import convert_pointclouds_to_tensor, get_point_covariances, wmean


def estimate_pointcloud_normals(
    pointclouds,
    neighborhood_size: int = 50,
    disambiguate_directions: bool = True,
    use_symeig_workaround: bool = True,
) -> jnp.ndarray:
    """Per-point normals as the smallest-eigenvalue eigenvector (reference :21)."""
    curvatures, local_frames = estimate_pointcloud_local_coord_frames(
        pointclouds,
        neighborhood_size=neighborhood_size,
        disambiguate_directions=disambiguate_directions,
        use_symeig_workaround=use_symeig_workaround,
    )
    # The normal is the direction of smallest variance: column 0.
    return local_frames[..., 0]


def estimate_pointcloud_local_coord_frames(
    pointclouds,
    neighborhood_size: int = 50,
    disambiguate_directions: bool = True,
    use_symeig_workaround: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point (curvatures (N,P,3), frames (N,P,3,3)) (reference :67)."""
    points_padded, num_points = convert_pointclouds_to_tensor(pointclouds)
    N, P, dim = points_padded.shape
    if dim != 3:
        raise ValueError("The pointclouds argument has to be of shape (N, P, 3)")
    if int(num_points.min()) <= neighborhood_size:
        raise ValueError(
            "The neighborhood_size argument has to be >= size of each of the clouds."
        )
    cov, knns = get_point_covariances(points_padded, num_points, neighborhood_size)
    curvatures, local_coord_frames = symeig3x3(cov, eigenvectors=True)

    if disambiguate_directions:
        # Flip normals/tangents toward the mean neighborhood offset
        # (reference `_disambiguate_vector_directions`, points_normals.py:139).
        knn_deltas = knns - points_padded[:, :, None]
        n = _disambiguate_vector_directions(
            knn_deltas, local_coord_frames[:, :, :, 0]
        )
        z = _disambiguate_vector_directions(
            knn_deltas, local_coord_frames[:, :, :, 2]
        )
        y = jnp.cross(z, n)
        local_coord_frames = jnp.stack((n, y, z), axis=3)
    return curvatures, local_coord_frames


def _disambiguate_vector_directions(df: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Flip vecs so they point toward the mean of neighbor offsets df."""
    proj = jnp.sum(df * vecs[:, :, None], axis=-1)  # (N, P, K)
    flip = (jnp.sum(proj, axis=-1, keepdims=True) < 0).astype(vecs.dtype)
    return (1.0 - 2.0 * flip) * vecs
