"""Shared op utilities (reference ops/utils.py).

`wmean` :15, `masked_gather` :66, `convert_pointclouds_to_tensor` :120,
`get_point_covariances` :165.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from ..structures.pointclouds import Pointclouds
from .knn import knn_gather, knn_points


def eyes(dim: int, N: int, dtype=jnp.float32) -> jnp.ndarray:
    """(N, dim, dim) batch of identity matrices (reference ops/utils.py)."""
    return jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (N, dim, dim))


def wmean(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    axis: Union[int, Tuple[int, ...]] = -2,
    keepdims: bool = True,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """Weighted mean over `axis` (reference ops/utils.py:15)."""
    if weight is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    w = weight[..., None]
    return jnp.sum(x * w, axis=axis, keepdims=keepdims) / jnp.clip(
        jnp.sum(w, axis=axis, keepdims=keepdims), eps
    )


def masked_gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (N, P, D) by (N, K) or (N, K, S) indices where -1 -> 0
    (reference ops/utils.py:66)."""
    import jax

    mask = idx >= 0
    safe = jnp.maximum(idx, 0)
    if idx.ndim == 2:
        out = jax.vmap(lambda p, i: p[i])(points, safe)
    elif idx.ndim == 3:
        out = jax.vmap(lambda p, i: p[i])(points, safe.reshape(safe.shape[0], -1))
        out = out.reshape(idx.shape + (points.shape[-1],))
    else:
        raise ValueError("idx format is not supported %s" % repr(idx.shape))
    return jnp.where(mask[..., None], out, 0.0)


def convert_pointclouds_to_tensor(pcl):
    """Pointclouds|array -> (padded (N,P,3), num_points (N,)) (reference :120)."""
    if isinstance(pcl, Pointclouds):
        return pcl.points_padded(), pcl.num_points_per_cloud()
    pcl = jnp.asarray(pcl)
    return pcl, jnp.full((pcl.shape[0],), pcl.shape[1], dtype=jnp.int32)


def is_pointclouds(pcl) -> bool:
    return isinstance(pcl, Pointclouds)


def get_point_covariances(
    points_padded: jnp.ndarray,
    num_points_per_cloud: jnp.ndarray,
    neighborhood_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN-neighborhood covariance matrices (reference ops/utils.py:165).

    Returns (covariances (N, P, 3, 3), k_nearest_neighbors (N, P, K, 3)).
    """
    k_nn = knn_points(
        points_padded,
        points_padded,
        lengths1=num_points_per_cloud,
        lengths2=num_points_per_cloud,
        K=neighborhood_size,
        return_nn=True,
    ).knn  # (N, P, K, 3)
    centered = k_nn - jnp.mean(k_nn, axis=2, keepdims=True)
    import jax as _jax

    cov = jnp.einsum(
        "npki,npkj->npij", centered, centered,
        preferred_element_type=jnp.float32,
        precision=_jax.lax.Precision.HIGHEST,
    ) / max(neighborhood_size, 1)
    return cov, k_nn
