"""Voxel grids: dense + tensor-factorized (TensoRF CP/VM).

Parity: reference implicitron/models/implicit_function/voxel_grid.py:47-808
(`FullResolutionVoxelGrid`, `CPFactorizedVoxelGrid`,
`VMFactorizedVoxelGrid`).

Flax modules mapping world points in [-1, 1]^3 to feature vectors.  All
interpolation is our jnp grid_sample (ops/grid_sample.py) — on TPU the
factorized grids are particularly friendly: plane/line samples are small
gathers and the feature combine is elementwise/matmul on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops.grid_sample import grid_sample


def _sample_3d(volume: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """volume (C, D, H, W), points (..., 3) xyz in [-1, 1] -> (..., C)."""
    spatial = points.shape[:-1]
    grid = points.reshape(1, 1, 1, -1, 3)
    out = grid_sample(
        volume[None], grid, mode="bilinear", padding_mode="zeros",
        align_corners=True,
    )  # (1, C, 1, 1, P)
    return jnp.moveaxis(out[0, :, 0, 0], 0, -1).reshape(spatial + (-1,))


def _sample_2d(plane: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """plane (C, H, W), xy (..., 2) in [-1, 1] -> (..., C)."""
    spatial = xy.shape[:-1]
    grid = xy.reshape(1, 1, -1, 2)
    out = grid_sample(
        plane[None], grid, mode="bilinear", padding_mode="zeros",
        align_corners=True,
    )  # (1, C, 1, P)
    return jnp.moveaxis(out[0, :, 0], 0, -1).reshape(spatial + (-1,))


def _sample_1d(line: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """line (C, L), x (...,) in [-1, 1] -> (..., C)."""
    xy = jnp.stack([x, jnp.zeros_like(x)], axis=-1)
    return _sample_2d(line[:, None, :], xy)


class FullResolutionVoxelGrid(nn.Module):
    """Dense (C, D, H, W) learned grid (reference voxel_grid.py:171)."""

    n_features: int = 1
    resolution: Tuple[int, int, int] = (64, 64, 64)  # (D, H, W)
    init_std: float = 0.1
    init_mean: float = 0.0

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        D, H, W = self.resolution
        voxel_grid = self.param(
            "voxel_grid",
            lambda k, s: self.init_mean
            + self.init_std * jax.random.normal(k, s),
            (self.n_features, D, H, W),
        )
        return _sample_3d(voxel_grid, points)


class CPFactorizedVoxelGrid(nn.Module):
    """CANDECOMP/PARAFAC rank-R factorization (reference :320): feature =
    matrix_reduction( sum over components of fx(x) * fy(y) * fz(z) )."""

    n_features: int = 1
    resolution: Tuple[int, int, int] = (64, 64, 64)
    n_components: int = 24
    basis_matrix: bool = True
    init_std: float = 0.1

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        D, H, W = self.resolution
        R = self.n_components
        init = nn.initializers.normal(self.init_std)
        vx = self.param("vector_components_x", init, (R, W))
        vy = self.param("vector_components_y", init, (R, H))
        vz = self.param("vector_components_z", init, (R, D))
        fx = _sample_1d(vx, points[..., 0])
        fy = _sample_1d(vy, points[..., 1])
        fz = _sample_1d(vz, points[..., 2])
        feats = fx * fy * fz  # (..., R)
        if self.basis_matrix:
            return nn.Dense(self.n_features, use_bias=False,
                            name="basis_matrix")(feats)
        return jnp.sum(feats, axis=-1, keepdims=True)


class VMFactorizedVoxelGrid(nn.Module):
    """Vector-Matrix factorization (TensoRF, reference :472): feature =
    sum of plane(x,y)*line(z) terms over the three axis splits."""

    n_features: int = 1
    resolution: Tuple[int, int, int] = (64, 64, 64)
    n_components: int = 24
    basis_matrix: bool = True
    init_std: float = 0.1

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        D, H, W = self.resolution
        R = self.n_components // 3
        init = nn.initializers.normal(self.init_std)
        # plane (a, b) + line (c) for each axis split
        p_xy = self.param("plane_xy", init, (R, H, W))
        l_z = self.param("line_z", init, (R, D))
        p_xz = self.param("plane_xz", init, (R, D, W))
        l_y = self.param("line_y", init, (R, H))
        p_yz = self.param("plane_yz", init, (R, D, H))
        l_x = self.param("line_x", init, (R, W))

        x, y, z = points[..., 0], points[..., 1], points[..., 2]
        f1 = _sample_2d(p_xy, jnp.stack([x, y], -1)) * _sample_1d(l_z, z)
        f2 = _sample_2d(p_xz, jnp.stack([x, z], -1)) * _sample_1d(l_y, y)
        f3 = _sample_2d(p_yz, jnp.stack([y, z], -1)) * _sample_1d(l_x, x)
        feats = jnp.concatenate([f1, f2, f3], axis=-1)  # (..., 3R)
        if self.basis_matrix:
            return nn.Dense(self.n_features, use_bias=False,
                            name="basis_matrix")(feats)
        return jnp.sum(feats, axis=-1, keepdims=True)
