"""Chamfer distance between point sets (+ optional normals term).

Parity: reference loss/chamfer.py:176.  Built on the MXU-backed knn_points;
all reduction modes of the reference are supported.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from ..common.math_utils import safe_normalize
from ..ops.knn import knn_gather, knn_points
from ..structures.pointclouds import Pointclouds


def _handle_pointcloud_input(points, lengths, normals):
    """Pointclouds | padded array -> (padded, lengths, normals) (reference :38)."""
    if isinstance(points, Pointclouds):
        X = points.points_padded()
        lengths = points.num_points_per_cloud()
        normals = points.normals_padded()
    else:
        X = jnp.asarray(points)
        if X.ndim != 3:
            raise ValueError("Expected points to be of shape (N, P, D)")
        if lengths is None:
            lengths = jnp.full((X.shape[0],), X.shape[1], dtype=jnp.int32)
    return X, lengths, normals


def _chamfer_single_direction(
    x, y, x_lengths, y_lengths, x_normals, y_normals,
    weights, norm, abs_cosine,
):
    N, P1, D = x.shape
    x_mask = jnp.arange(P1, dtype=jnp.int32)[None] < x_lengths[:, None]

    nn = knn_points(x, y, x_lengths, y_lengths, norm=norm, K=1)
    cham_x = nn.dists[..., 0]  # (N, P1)
    cham_x = jnp.where(x_mask, cham_x, 0.0)

    cham_norm_x = None
    if x_normals is not None and y_normals is not None:
        y_nn_normals = knn_gather(y_normals, nn.idx, y_lengths)[..., 0, :]
        cos = jnp.sum(
            _normalize(x_normals) * _normalize(y_nn_normals), axis=-1
        )
        cos = jnp.abs(cos) if abs_cosine else cos
        cham_norm_x = jnp.where(x_mask, 1.0 - cos, 0.0)

    if weights is not None:
        cham_x = cham_x * weights[:, None]
        if cham_norm_x is not None:
            cham_norm_x = cham_norm_x * weights[:, None]
    return cham_x, cham_norm_x, x_mask


def _normalize(v, eps=1e-8):
    return safe_normalize(v)


def _reduce(cham, x_lengths, weights, point_reduction, batch_reduction):
    # point reduction over P
    if point_reduction == "mean":
        denom = jnp.clip(x_lengths.astype(cham.dtype), 1.0)
        cham = jnp.sum(cham, axis=1) / denom
    elif point_reduction == "sum":
        cham = jnp.sum(cham, axis=1)
    elif point_reduction == "max":
        cham = jnp.max(cham, axis=1)
    elif point_reduction is None:
        return cham
    else:
        raise ValueError('point_reduction must be one of ["mean", "sum", "max", None]')
    # batch reduction
    if batch_reduction is None:
        return cham
    if batch_reduction == "sum":
        return jnp.sum(cham)
    if batch_reduction == "mean":
        div = (
            jnp.clip(jnp.sum(weights), 1e-12)
            if weights is not None
            else cham.shape[0]
        )
        return jnp.sum(cham) / div
    raise ValueError('batch_reduction must be one of ["mean", "sum", None]')


def chamfer_distance(
    x,
    y,
    x_lengths: Optional[jnp.ndarray] = None,
    y_lengths: Optional[jnp.ndarray] = None,
    x_normals: Optional[jnp.ndarray] = None,
    y_normals: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    batch_reduction: Optional[str] = "mean",
    point_reduction: Optional[str] = "mean",
    norm: int = 2,
    single_directional: bool = False,
    abs_cosine: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Chamfer distance (reference loss/chamfer.py:176).

    Returns (loss, loss_normals); loss_normals is None when no normals given.
    """
    if norm not in (1, 2):
        raise ValueError("Support for 1 or 2 norm.")
    x, x_lengths, x_normals = _handle_pointcloud_input(x, x_lengths, x_normals)
    y, y_lengths, y_normals = _handle_pointcloud_input(y, y_lengths, y_normals)

    cham_x, cham_norm_x, _ = _chamfer_single_direction(
        x, y, x_lengths, y_lengths, x_normals, y_normals,
        weights, norm, abs_cosine,
    )
    loss_x = _reduce(cham_x, x_lengths, weights, point_reduction, batch_reduction)
    loss_norm_x = (
        _reduce(cham_norm_x, x_lengths, weights, point_reduction, batch_reduction)
        if cham_norm_x is not None
        else None
    )

    if single_directional:
        return loss_x, loss_norm_x

    cham_y, cham_norm_y, _ = _chamfer_single_direction(
        y, x, y_lengths, x_lengths, y_normals, x_normals,
        weights, norm, abs_cosine,
    )
    loss_y = _reduce(cham_y, y_lengths, weights, point_reduction, batch_reduction)
    loss_norm_y = (
        _reduce(cham_norm_y, y_lengths, weights, point_reduction, batch_reduction)
        if cham_norm_y is not None
        else None
    )

    if point_reduction == "max":
        loss = jnp.maximum(loss_x, loss_y)
        loss_norm = None
    else:
        loss = loss_x + loss_y
        loss_norm = (
            loss_norm_x + loss_norm_y if loss_norm_x is not None else None
        )
    return loss, loss_norm
