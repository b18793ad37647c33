"""Implicit-function utilities.

Parity: reference implicitron/models/implicit_function/utils.py
(`broadcast_global_code` :19, `create_embeddings_for_implicit_function`
:33, `interpolate_line` :97, `interpolate_plane` :130,
`interpolate_volume` :161, `get_rays_points_world` :192). The
interpolation helpers live in voxel_grid.py here and are re-exported.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ....renderer.implicit.utils import ray_bundle_to_ray_points
from .voxel_grid import (  # noqa: F401 (re-exports)
    interpolate_line,
    interpolate_plane,
    interpolate_volume,
)


def broadcast_global_code(
    embeds: jnp.ndarray, global_code: jnp.ndarray
) -> jnp.ndarray:
    """Expand a (B, D) global code over embeds' spatial dims and append
    it to the last dimension (reference utils.py:19)."""
    bs = embeds.shape[0]
    gc = global_code.reshape((bs,) + (1,) * (embeds.ndim - 2) + (-1,))
    gc = jnp.broadcast_to(
        gc, embeds.shape[:-1] + (global_code.shape[-1],)
    )
    return jnp.concatenate([embeds, gc], axis=-1)


def create_embeddings_for_implicit_function(
    xyz_world: jnp.ndarray,  # (B, ..., pts_per_ray, 3)
    xyz_in_camera_coords: bool,
    global_code: Optional[jnp.ndarray],
    camera,
    fun_viewpool: Optional[Callable],
    xyz_embedding_function: Optional[Callable],
    diag_cov: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Point embeddings for an implicit function: optional camera-frame
    transform, harmonic embedding (with optional integrated-PE diag
    covariance), view pooling, and global-code append (reference
    utils.py:33). Returns (B, n_src, n_rays, pts_per_ray, C)."""
    bs = xyz_world.shape[0]
    spatial_size = xyz_world.shape[1:-2]
    pts_per_ray = xyz_world.shape[-2]
    n_rays = 1
    for s in spatial_size:
        n_rays *= s

    if xyz_in_camera_coords:
        if camera is None:
            raise ValueError("Camera must be given if xyz_in_camera_coords")
        ray_points_for_embed = (
            camera.get_world_to_view_transform()
            .transform_points(xyz_world.reshape(bs, -1, 3))
            .reshape(xyz_world.shape)
        )
    else:
        ray_points_for_embed = xyz_world

    if xyz_embedding_function is None:
        embeds = jnp.zeros((bs, 1, n_rays, pts_per_ray, 0), xyz_world.dtype)
    else:
        if diag_cov is not None:
            embeds = xyz_embedding_function(
                ray_points_for_embed, diag_cov=diag_cov
            )
        else:
            embeds = xyz_embedding_function(ray_points_for_embed)
        embeds = embeds.reshape(bs, 1, n_rays, pts_per_ray, -1)

    if fun_viewpool is not None:
        pooled = fun_viewpool(xyz_world.reshape(bs, -1, 3))
        pooled = pooled.reshape(
            (bs, pooled.shape[1], n_rays, pts_per_ray, -1)
        )
        embeds = jnp.concatenate(
            [
                jnp.broadcast_to(
                    embeds, pooled.shape[:-1] + (embeds.shape[-1],)
                ),
                pooled,
            ],
            axis=-1,
        )

    if global_code is not None:
        embeds = broadcast_global_code(embeds, global_code)
    return embeds


def get_rays_points_world(
    ray_bundle=None, rays_points_world: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """The world ray points from exactly one of (ray_bundle,
    rays_points_world) (reference utils.py:192)."""
    if rays_points_world is not None and ray_bundle is not None:
        raise ValueError(
            "Cannot define both rays_points_world and ray_bundle,"
            " one has to be None."
        )
    if rays_points_world is not None:
        return rays_points_world
    if ray_bundle is not None:
        return ray_bundle_to_ray_points(ray_bundle)
    raise ValueError(
        "ray_bundle and rays_points_world cannot both be None"
    )
