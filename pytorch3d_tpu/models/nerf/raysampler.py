"""NeRF ray samplers: train-time Monte Carlo / eval-time grid, and the
probabilistic (importance) fine sampler.

Parity: reference projects/nerf/nerf/raysampler.py:106 (`NeRFRaysampler`),
:16 (`ProbabilisticRaysampler`).

TPU notes: the reference's precomputed ray cache is unnecessary — rays are
recomputed on the fly (cheap XLA math); random ray subsampling uses PRNG
keys threaded by the caller.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...renderer.implicit.raysampling import (
    MonteCarloRaysampler,
    NDCMultinomialRaysampler,
)
from ...renderer.implicit.sample_pdf import sample_pdf
from ...renderer.implicit.utils import RayBundle


class NeRFRaysampler:
    """MC rays at train time, full grid (optionally chunked) at eval."""

    def __init__(
        self,
        n_pts_per_ray: int,
        min_depth: float,
        max_depth: float,
        n_rays_per_image: int,
        image_width: int,
        image_height: int,
        stratified: bool = False,
        stratified_test: bool = False,
    ) -> None:
        self._stratified = stratified
        self._stratified_test = stratified_test
        self._grid_raysampler = NDCMultinomialRaysampler(
            image_width=image_width,
            image_height=image_height,
            n_pts_per_ray=n_pts_per_ray,
            min_depth=min_depth,
            max_depth=max_depth,
        )
        self._mc_raysampler = MonteCarloRaysampler(
            min_x=-1.0,
            max_x=1.0,
            min_y=-1.0,
            max_y=1.0,
            n_rays_per_image=n_rays_per_image,
            n_pts_per_ray=n_pts_per_ray,
            min_depth=min_depth,
            max_depth=max_depth,
        )

    def get_n_chunks(self, chunksize: int, batch_size: int) -> int:
        H, W = self._grid_raysampler._xy_grid.shape[:2]
        import math

        return int(math.ceil(H * W * batch_size / chunksize))

    def __call__(
        self,
        cameras,
        chunksize: Optional[int] = None,
        chunk_idx: int = 0,
        camera_hash=None,
        caching: bool = False,
        key: Optional[jax.Array] = None,
        training: bool = True,
        **kwargs,
    ) -> RayBundle:
        if training:
            bundle = self._mc_raysampler(
                cameras, stratified_sampling=self._stratified, key=key
            )
        else:
            bundle = self._grid_raysampler(
                cameras, stratified_sampling=self._stratified_test, key=key
            )
            if chunksize is not None:
                B = bundle.origins.shape[0]
                n_rays = 1
                for s in bundle.origins.shape[1:-1]:
                    n_rays *= s
                flat = RayBundle(
                    origins=bundle.origins.reshape(B, n_rays, 3),
                    directions=bundle.directions.reshape(B, n_rays, 3),
                    lengths=bundle.lengths.reshape(B, n_rays, -1),
                    xys=bundle.xys.reshape(B, n_rays, 2),
                )
                start = chunk_idx * chunksize
                sl = lambda x: jax.lax.dynamic_slice_in_dim(
                    x, start, min(chunksize, n_rays), axis=1
                )
                bundle = RayBundle(
                    origins=sl(flat.origins),
                    directions=sl(flat.directions),
                    lengths=sl(flat.lengths),
                    xys=sl(flat.xys),
                )
        return bundle


class ProbabilisticRaysampler:
    """Importance resampling of per-ray depths from EA weights
    (reference raysampler.py:16)."""

    def __init__(
        self,
        n_pts_per_ray: int,
        stratified: bool = True,
        stratified_test: bool = False,
        add_input_samples: bool = True,
    ) -> None:
        self._n_pts_per_ray = n_pts_per_ray
        self._stratified = stratified
        self._stratified_test = stratified_test
        self._add_input_samples = add_input_samples

    def __call__(
        self,
        input_ray_bundle: RayBundle,
        ray_weights: jnp.ndarray,
        training: bool = True,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> RayBundle:
        z_vals = input_ray_bundle.lengths  # (..., S)
        with_stratification = (
            self._stratified if training else self._stratified_test
        )
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_new = sample_pdf(
            z_mid,
            ray_weights[..., 1:-1],
            self._n_pts_per_ray,
            det=not with_stratification,
            key=key,
        )
        z_new = jax.lax.stop_gradient(z_new)
        if self._add_input_samples:
            z_new = jnp.concatenate([z_vals, z_new], axis=-1)
        z_new = jnp.sort(z_new, axis=-1)
        return RayBundle(
            origins=input_ray_bundle.origins,
            directions=input_ray_bundle.directions,
            lengths=z_new,
            xys=input_ray_bundle.xys,
        )
