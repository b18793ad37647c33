"""EPnP: camera pose from 2D-3D correspondences.

Parity: reference ops/perspective_n_points.py:305 (`efficient_pnp`),
following Lepetit et al. 2009.  All linear algebra is batched XLA
(svd / lstsq); the three null-space-coordinate candidate solvers of the
reference (:234, :254, :278) are reproduced and the best candidate per
batch element is selected by reprojection error.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .points_alignment import corresponding_points_alignment
from .utils import wmean


class EpnpSolution(NamedTuple):
    x_cam: jnp.ndarray
    R: jnp.ndarray
    T: jnp.ndarray
    err_2d: jnp.ndarray
    err_3d: jnp.ndarray


def _define_control_points(x, weight):
    """4 control points: weighted centroid + principal directions."""
    x_mean = wmean(x, weight)  # (B, 1, 3)
    x_centered = x - x_mean
    if weight is not None:
        xc = x_centered * weight[..., None]
    else:
        xc = x_centered
    cov = jnp.einsum("bni,bnj->bij", xc, x_centered)
    _, e_vec = jnp.linalg.eigh(cov)  # ascending
    # principal directions as offsets from the centroid
    c_world = jnp.concatenate(
        [e_vec.swapaxes(-1, -2) + x_mean, x_mean], axis=-2
    )  # (B, 4, 3)
    return c_world


def _compute_alphas(x, c_world):
    """Barycentric coords of x wrt 4 control points: solve [c;1] alpha = [x;1]."""
    B, N, _ = x.shape
    ones = jnp.ones((B, N, 1), x.dtype)
    x_h = jnp.concatenate([x, ones], axis=-1)  # (B, N, 4)
    c_h = jnp.concatenate(
        [c_world, jnp.ones((B, 4, 1), x.dtype)], axis=-1
    )  # (B, 4, 4)
    # alphas @ c_h = x_h  ->  alphas = x_h @ inv(c_h)
    return x_h @ jnp.linalg.inv(c_h)  # (B, N, 4)


def _build_M(y, alphas, weight):
    """(B, 2N, 12) system matrix of the projection constraints."""
    B, N, _ = y.shape
    u, v = y[..., 0], y[..., 1]  # (B, N)
    if weight is not None:
        alphas = alphas * weight[..., None]
    zeros = jnp.zeros_like(alphas)
    # rows: [a*1, 0, -a*u] and [0, a*1, -a*v] interleaved over the 4 alphas
    row_u = jnp.stack(
        [alphas, zeros, -alphas * u[..., None]], axis=-1
    )  # (B, N, 4, 3)
    row_v = jnp.stack(
        [zeros, alphas, -alphas * v[..., None]], axis=-1
    )
    M = jnp.stack([row_u, row_v], axis=2)  # (B, N, 2, 4, 3)
    return M.reshape(B, 2 * N, 12)


def _null_space(M, kernel_dim):
    """Smallest right singular vectors of M -> (B, kernel_dim, 4, 3)."""
    _, _, Vt = jnp.linalg.svd(M, full_matrices=True)
    null = Vt[:, -kernel_dim:]  # (B, k, 12), smallest last
    null = null[:, ::-1]  # order by ascending singular value
    return null.reshape(null.shape[0], kernel_dim, 4, 3)


def _gen_pairs(t, reducer):
    """All 6 unordered pairs over dim -2."""
    import itertools

    idx = list(itertools.combinations(range(t.shape[-2]), 2))
    a = t[..., [i for i, _ in idx], :]
    b = t[..., [j for _, j in idx], :]
    return reducer(a, b)


def _pair_dists(t):
    return _gen_pairs(t, lambda a, b: jnp.sum((a - b) ** 2, axis=-1))


def _kernel_vec_distances(v):
    """Pairwise-distance features of kernel control points.

    v: (B, k=4, 4, 3). Returns (B, 6, 10): for each of 6 control-point
    pairs, the dot products of difference vectors across kernel dims
    (diagonal terms + 2*off-diagonal), matching reference :192.
    """
    dv = _gen_pairs(v, lambda a, b: a - b)  # (B, k, 6, 3) pairs over ctrl pts
    dv = dv.swapaxes(1, 2)  # (B, 6, k, 3)
    dots = jnp.einsum("bpki,bpli->bpkl", dv, dv)  # (B, 6, k, k)
    k = dv.shape[-2]
    iu = jnp.triu_indices(k)
    feats = []
    for i, j in zip(*iu):
        f = dots[..., i, j]
        feats.append(f if i == j else 2.0 * f)
    return jnp.stack(feats, axis=-1)  # (B, 6, 10)


def _solve_lstsq_subcols(rhs, lhs, cols):
    """Batched least squares on a subset of columns of lhs
    (normal equations; jnp.linalg.lstsq is not batched)."""
    A = lhs[..., jnp.asarray(cols)]  # (B, 6, k)
    AtA = jnp.einsum("bnk,bnl->bkl", A, A)
    Atb = jnp.einsum("bnk,bn->bk", A, rhs)
    k = AtA.shape[-1]
    AtA = AtA + 1e-9 * jnp.eye(k, dtype=AtA.dtype)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]  # (B, k)


def _binary_sign(t):
    return jnp.where(t >= 0, 1.0, -1.0)


# column layout of the 10 features for k=4 (triu order):
# (0,0) (0,1) (0,2) (0,3) (1,1) (1,2) (1,3) (2,2) (2,3) (3,3)
_COL = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3, (1, 1): 4,
        (1, 2): 5, (1, 3): 6, (2, 2): 7, (2, 3): 8, (3, 3): 9}


def _find_null_space_coords_1(kernel_dsts, cw_dst, eps=1e-9):
    """beta from dims {b00, b01, b02, b03} (reference :234)."""
    beta = _solve_lstsq_subcols(
        cw_dst, kernel_dsts, [_COL[(0, 0)], _COL[(0, 1)], _COL[(0, 2)], _COL[(0, 3)]]
    )
    coord_0 = jnp.sqrt(jnp.abs(beta[:, :1]) + eps)
    return jnp.concatenate(
        [coord_0, beta[:, 1:] / jnp.clip(coord_0, eps)], axis=-1
    ) * _binary_sign(beta[:, :1])


def _find_null_space_coords_2(kernel_dsts, cw_dst):
    """beta from dims {b00, b01, b11} (reference :254)."""
    beta = _solve_lstsq_subcols(
        cw_dst, kernel_dsts, [_COL[(0, 0)], _COL[(0, 1)], _COL[(1, 1)]]
    )
    coord_0 = jnp.sqrt(jnp.abs(beta[:, :1]))
    coord_1 = jnp.sqrt(jnp.abs(beta[:, 2:3])) * _binary_sign(
        beta[:, 1:2]
    ) * _binary_sign(beta[:, :1])
    zeros = jnp.zeros_like(coord_0)
    return jnp.concatenate([coord_0, coord_1, zeros, zeros], axis=-1) * _binary_sign(
        beta[:, :1]
    )


def _find_null_space_coords_3(kernel_dsts, cw_dst, eps=1e-9):
    """beta from dims {b00, b01, b11, b02, b12} (reference :278)."""
    beta = _solve_lstsq_subcols(
        cw_dst,
        kernel_dsts,
        [_COL[(0, 0)], _COL[(0, 1)], _COL[(1, 1)], _COL[(0, 2)], _COL[(1, 2)]],
    )
    coord_0 = jnp.sqrt(jnp.abs(beta[:, :1]) + eps)
    coord_1 = jnp.sqrt(jnp.abs(beta[:, 2:3]) + eps) * _binary_sign(
        beta[:, 1:2]
    ) * _binary_sign(beta[:, :1])
    coord_2 = beta[:, 3:4] / jnp.clip(coord_0, eps)
    zeros = jnp.zeros_like(coord_0)
    return jnp.concatenate(
        [coord_0, coord_1, coord_2, zeros], axis=-1
    ) * _binary_sign(beta[:, :1])


def _reproj_error(y_hat, y, weight, eps=1e-9):
    ratio = y_hat[..., :2] / jnp.where(
        jnp.abs(y_hat[..., 2:]) > eps, y_hat[..., 2:], eps
    )
    err = jnp.sqrt(jnp.sum((ratio - y) ** 2, axis=-1) + eps)
    return wmean(err[..., None], weight)[..., 0, 0]


def _algebraic_error(x_w_rotated, x_cam, weight):
    err = jnp.sqrt(jnp.sum((x_w_rotated - x_cam) ** 2, axis=-1) + 1e-9)
    return wmean(err[..., None], weight)[..., 0, 0]


def _compute_norm_sign_scaling_factor(c_cam, alphas, x_world, weight, eps=1e-9):
    """Scale + sign fix so camera points have positive depth and world scale."""
    x_cam = alphas @ c_cam  # (B, N, 3)
    x_cam_mean = wmean(x_cam, weight)
    x_world_mean = wmean(x_world, weight)
    d_cam = jnp.sqrt(
        jnp.sum((x_cam - x_cam_mean) ** 2, axis=-1) + eps
    )
    d_world = jnp.sqrt(
        jnp.sum((x_world - x_world_mean) ** 2, axis=-1) + eps
    )
    scale = wmean((d_world / jnp.clip(d_cam, eps))[..., None], weight)[..., 0, 0]
    x_cam = x_cam * scale[:, None, None]
    # points must be in front of the camera (+z)
    neg = jnp.sum(
        (x_cam[..., 2] < 0)
        * (weight if weight is not None else jnp.ones_like(x_cam[..., 2])),
        axis=-1,
    )
    tot = (
        jnp.sum(weight, axis=-1)
        if weight is not None
        else x_cam.shape[1] * jnp.ones_like(neg)
    )
    sign = jnp.where(neg > 0.5 * tot, -1.0, 1.0)
    return x_cam * sign[:, None, None]


def efficient_pnp(
    x: jnp.ndarray,  # (B, N, 3) world points
    y: jnp.ndarray,  # (B, N, 2) NDC image points
    weights: Optional[jnp.ndarray] = None,
    skip_quadratic_eq: bool = False,
) -> EpnpSolution:
    """EPnP pose estimation (reference ops/perspective_n_points.py:305).

    Camera convention: x_cam = x @ R + T, projection y = x_cam[:2]/x_cam[2].
    """
    c_world = _define_control_points(x, weights)
    alphas = _compute_alphas(x, c_world)
    M = _build_M(y, alphas, weights)
    kernel = _null_space(M, 4)  # (B, 4, 4, 3)

    kernel_dsts = _kernel_vec_distances(kernel)  # (B, 6, 10)
    cw_dst = _pair_dists(c_world)  # (B, 6)

    solvers = [_find_null_space_coords_1]
    if not skip_quadratic_eq:
        solvers += [_find_null_space_coords_2, _find_null_space_coords_3]

    solutions = []
    for solver in solvers:
        betas = solver(kernel_dsts, cw_dst)  # (B, 4)
        c_cam = jnp.einsum("bk,bkij->bij", betas, kernel)  # (B, 4, 3)
        x_cam = _compute_norm_sign_scaling_factor(c_cam, alphas, x, weights)
        sim = corresponding_points_alignment(
            x, x_cam, weights=weights, estimate_scale=False
        )
        x_w_rotated = jnp.einsum("bni,bij->bnj", x, sim.R) + sim.T[:, None]
        err_2d = _reproj_error(x_w_rotated, y, weights)
        err_3d = _algebraic_error(x_w_rotated, x_cam, weights)
        solutions.append(
            EpnpSolution(x_cam, sim.R, sim.T, err_2d, err_3d)
        )

    if len(solutions) == 1:
        return solutions[0]
    # pick the best solution per batch element by reprojection error
    errs = jnp.stack([s.err_2d for s in solutions], axis=0)  # (S, B)
    best = jnp.argmin(errs, axis=0)  # (B,)

    def pick(field_idx):
        stacked = jnp.stack(
            [s[field_idx] for s in solutions], axis=0
        )  # (S, B, ...)
        return jnp.take_along_axis(
            stacked,
            best.reshape((1, -1) + (1,) * (stacked.ndim - 2)),
            axis=0,
        )[0]

    return EpnpSolution(*[pick(i) for i in range(5)])
