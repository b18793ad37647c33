"""Closed-form eigendecomposition of symmetric 3x3 matrices.

Parity target: reference common/workaround/symeig3x3.py (used by
ops/points_normals).  Implementation is the standard analytic method:
eigenvalues from the trigonometric solution of the characteristic cubic
(Smith 1961), eigenvectors from cross products of shifted-matrix rows,
both written branch-free for jit/vmap/grad safety on TPU.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp


def _eigenvalues(A: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3), ascending, shape (..., 3)."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, eps))
    # r = det(B) / (2 p^3), clipped into acos domain.
    detB = jnp.linalg.det(B)
    r = detB / (2.0 * p * p * p)
    r = jnp.clip(r, -1.0 + eps, 1.0 - eps)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0 * math.pi / 3.0
    eig1 = q + 2.0 * p * jnp.cos(phi)                 # largest
    eig3 = q + 2.0 * p * jnp.cos(phi + two_pi_3)      # smallest
    eig2 = 3.0 * q - eig1 - eig3
    evals = jnp.stack([eig3, eig2, eig1], axis=-1)
    # Degenerate (near-spherical) case: all eigenvalues equal q.
    degenerate = p2 < eps
    evals = jnp.where(
        degenerate[..., None], jnp.broadcast_to(q[..., None], evals.shape), evals
    )
    return evals


def _robust_eigenvector(A_shift: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Null-space direction of a (near-)rank-2 symmetric matrix.

    Takes all three pairwise cross products of the rows and returns the one
    with the largest norm (branch-free via argmax one-hot blending).
    """
    r0, r1, r2 = A_shift[..., 0, :], A_shift[..., 1, :], A_shift[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c12 = jnp.cross(r1, r2)
    c20 = jnp.cross(r2, r0)
    cands = jnp.stack([c01, c12, c20], axis=-2)  # (..., 3, 3)
    norms = jnp.sum(cands * cands, axis=-1)  # (..., 3)
    best = jnp.argmax(norms, axis=-1)
    onehot = (
        best[..., None] == jnp.arange(3, dtype=best.dtype)
    ).astype(A_shift.dtype)
    v = jnp.sum(cands * onehot[..., None], axis=-2)
    vnorm2 = jnp.sum(v * v, axis=-1, keepdims=True)
    v = v / jnp.sqrt(jnp.maximum(vnorm2, eps))

    # Rank-1 fallback (eigenvalue multiplicity 2): all row cross products
    # vanish; the null space is the plane orthogonal to the largest row.
    rows = jnp.stack([r0, r1, r2], axis=-2)
    row_norms = jnp.sum(rows * rows, axis=-1)
    best_row = jnp.argmax(row_norms, axis=-1)
    row_onehot = (
        best_row[..., None] == jnp.arange(3, dtype=best_row.dtype)
    ).astype(A_shift.dtype)
    u = jnp.sum(rows * row_onehot[..., None], axis=-2)
    eye = jnp.eye(3, dtype=A_shift.dtype)
    w0 = jnp.cross(u, jnp.broadcast_to(eye[0], u.shape))
    w1 = jnp.cross(u, jnp.broadcast_to(eye[1], u.shape))
    w0n2 = jnp.sum(w0 * w0, axis=-1, keepdims=True)
    w1n2 = jnp.sum(w1 * w1, axis=-1, keepdims=True)
    w = jnp.where(w0n2 > w1n2, w0, w1)
    wn2 = jnp.maximum(w0n2, w1n2)
    w = w / jnp.sqrt(jnp.maximum(wn2, eps))

    # Rank-0 fallback (spherical): any unit vector.
    e0 = jnp.broadcast_to(eye[0], v.shape)
    rank1 = vnorm2[..., 0] < eps
    rank0 = jnp.logical_and(rank1, jnp.max(row_norms, axis=-1) < eps)
    out = jnp.where(rank1[..., None], w, v)
    out = jnp.where(rank0[..., None], e0, out)
    return out


def symeig3x3(
    inputs: jnp.ndarray, eigenvectors: bool = True, eps: Optional[float] = None
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Eigenvalues (ascending) and optionally eigenvectors of symmetric 3x3.

    Args:
        inputs: (..., 3, 3) symmetric matrices.
        eigenvectors: also return eigenvectors as columns of (..., 3, 3).
        eps: numerical floor; defaults to 1e-10 in the working dtype.

    Returns:
        (eigenvalues (..., 3), eigenvectors (..., 3, 3) or None).
        Columns eigenvectors[..., :, i] correspond to eigenvalues[..., i].
    """
    if inputs.shape[-2:] != (3, 3):
        raise ValueError("Only inputs of shape (..., 3, 3) are supported.")
    if eps is None:
        eps = 1e-10

    A = 0.5 * (inputs + jnp.swapaxes(inputs, -1, -2))
    # Scale for conditioning (keeps the cubic well-behaved across magnitudes).
    scale = jnp.maximum(
        jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True), eps
    )
    As = A / scale
    evals = _eigenvalues(As, eps)

    if not eigenvectors:
        return evals * scale[..., 0], None

    eye = jnp.eye(3, dtype=A.dtype)
    # First eigenvector from (A - l0 I); third from (A - l2 I); second is
    # their cross product (guaranteed orthogonal, robust to repeated evals).
    v0 = _robust_eigenvector(As - evals[..., 0, None, None] * eye, eps)
    v2 = _robust_eigenvector(As - evals[..., 2, None, None] * eye, eps)
    # Re-orthogonalize v2 against v0 (helps when l0 ~ l2, i.e. near-spherical).
    v2 = v2 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v0
    v2n2 = jnp.sum(v2 * v2, axis=-1, keepdims=True)
    # If v2 collapsed (all evals equal), fall back to an arbitrary orthogonal.
    fallback = jnp.cross(v0, jnp.broadcast_to(eye[0], v0.shape))
    fallback_n2 = jnp.sum(fallback * fallback, axis=-1, keepdims=True)
    alt = jnp.cross(v0, jnp.broadcast_to(eye[1], v0.shape))
    alt_n2 = jnp.sum(alt * alt, axis=-1, keepdims=True)
    fallback = jnp.where(
        fallback_n2 > 0.01,
        fallback / jnp.sqrt(jnp.maximum(fallback_n2, eps)),
        alt / jnp.sqrt(jnp.maximum(alt_n2, eps)),
    )
    collapsed = v2n2[..., 0] < 1e-6
    v2 = jnp.where(
        collapsed[..., None], fallback, v2 / jnp.sqrt(jnp.maximum(v2n2, eps))
    )
    v1 = jnp.cross(v2, v0)
    evecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return evals * scale[..., 0], evecs
