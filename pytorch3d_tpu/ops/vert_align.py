"""Project 3D vertices into 2D image feature maps (Mesh R-CNN "vert align").

Parity: reference ops/vert_align.py:14.  Uses our jnp grid_sample.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from .grid_sample import grid_sample


def vert_align(
    feats,
    verts,
    return_packed: bool = False,
    interp_mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Sample features at projected vertex locations (reference :14).

    feats: (N, C, H, W) or list thereof; verts: (N, V, 3) array or an object
    with `verts_padded`/`points_padded`.  The (x, y) of each vert are taken
    as NDC coords in [-1, 1].
    """
    if hasattr(verts, "verts_padded"):
        grid = verts.verts_padded()
    elif hasattr(verts, "points_padded"):
        grid = verts.points_padded()
    else:
        grid = verts
    grid = grid[:, None, :, :2]  # (N, 1, V, 2)

    if isinstance(feats, jnp.ndarray):
        feats = [feats]
    for f in feats:
        if f.ndim != 4:
            raise ValueError("feats must have shape (N, C, H, W)")
        if grid.shape[0] != f.shape[0]:
            raise ValueError("inconsistent batch dimension")

    feats_sampled = []
    for f in feats:
        s = grid_sample(
            f, grid, mode=interp_mode, padding_mode=padding_mode,
            align_corners=align_corners,
        )  # (N, C, 1, V)
        feats_sampled.append(jnp.transpose(s[:, :, 0], (0, 2, 1)))  # (N, V, C)
    out = jnp.concatenate(feats_sampled, axis=2)
    if return_packed:
        out = out.reshape(-1, out.shape[-1])
    return out
