"""Ray samplers: full-grid, NDC-grid, and Monte Carlo.

Parity: reference renderer/implicit/raysampling.py:30
(`MultinomialRaysampler`), :278 (`NDCMultinomialRaysampler`), :330
(`MonteCarloRaysampler`), stratified jiggle :695, `_xy_to_ray_bundle` :740.

TPU notes: all shapes static.  `n_rays_per_image` subsampling uses
`jax.random` keys passed by the caller (defaults to PRNGKey(0)); stratified
depth jiggle likewise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .utils import HeterogeneousRayBundle, RayBundle


def _safe_multinomial_xy(key, xy_grid, n_rays):
    """Uniformly choose n_rays of the H*W grid positions (with replacement
    semantics only when n_rays > H*W, like reference _safe_multinomial)."""
    B = xy_grid.shape[0]
    HW = xy_grid.shape[1]
    if n_rays <= HW:
        idx = jax.vmap(
            lambda k: jax.random.choice(k, HW, (n_rays,), replace=False)
        )(jax.random.split(key, B))
    else:
        idx = jax.vmap(
            lambda k: jax.random.choice(k, HW, (n_rays,), replace=True)
        )(jax.random.split(key, B))
    return jax.vmap(lambda g, i: g[i])(xy_grid, idx)


def _jiggle_within_stratas(key, bin_centers: jnp.ndarray) -> jnp.ndarray:
    """Uniform jiggle within depth strata (reference raysampling.py:695)."""
    mids = 0.5 * (bin_centers[..., 1:] + bin_centers[..., :-1])
    upper = jnp.concatenate([mids, bin_centers[..., -1:]], axis=-1)
    lower = jnp.concatenate([bin_centers[..., :1], mids], axis=-1)
    u = jax.random.uniform(key, bin_centers.shape, bin_centers.dtype)
    return lower + (upper - lower) * u


def _xy_to_ray_bundle(
    cameras,
    xy_grid: jnp.ndarray,  # (B, ..., 2)
    min_depth: float,
    max_depth: float,
    n_pts_per_ray: int,
    unit_directions: bool = False,
    stratified_sampling: bool = False,
    key: Optional[jax.Array] = None,
) -> RayBundle:
    """Unproject an xy grid into world rays (reference :740)."""
    B = xy_grid.shape[0]
    spatial = xy_grid.shape[1:-1]
    n_rays = 1
    for s in spatial:
        n_rays *= s
    xy = xy_grid.reshape(B, n_rays, 2)

    # unproject at depths 1 and 2 to get the ray direction field
    ones = jnp.ones_like(xy[..., :1])
    plane1 = cameras.unproject_points(
        jnp.concatenate([xy, ones], axis=-1), from_ndc=True
    )
    plane2 = cameras.unproject_points(
        jnp.concatenate([xy, 2.0 * ones], axis=-1), from_ndc=True
    )
    directions = plane2 - plane1
    origins = plane1 - directions  # depth 0

    if n_pts_per_ray > 0:
        depths = jnp.linspace(
            min_depth, max_depth, n_pts_per_ray, dtype=xy.dtype
        )
        lengths = jnp.broadcast_to(depths, (B, n_rays, n_pts_per_ray))
        if stratified_sampling:
            if key is None:
                key = jax.random.PRNGKey(0)
            lengths = _jiggle_within_stratas(key, lengths)
    else:
        lengths = jnp.zeros((B, n_rays, 0), xy.dtype)

    if unit_directions:
        norm = jnp.linalg.norm(directions, axis=-1, keepdims=True)
        directions = directions / jnp.clip(norm, 1e-12)
        lengths = lengths * norm

    return RayBundle(
        origins=origins.reshape((B,) + spatial + (3,)),
        directions=directions.reshape((B,) + spatial + (3,)),
        lengths=lengths.reshape((B,) + spatial + (n_pts_per_ray,)),
        xys=xy_grid,
    )


class MultinomialRaysampler:
    """Grid raysampler, optional multinomial subsampling (reference :30)."""

    def __init__(
        self,
        *,
        min_x: float,
        max_x: float,
        min_y: float,
        max_y: float,
        image_width: int,
        image_height: int,
        n_pts_per_ray: int,
        min_depth: float,
        max_depth: float,
        n_rays_per_image: Optional[int] = None,
        n_rays_total: Optional[int] = None,
        unit_directions: bool = False,
        stratified_sampling: bool = False,
    ) -> None:
        self._n_pts_per_ray = n_pts_per_ray
        self._min_depth = min_depth
        self._max_depth = max_depth
        self._n_rays_per_image = n_rays_per_image
        self._n_rays_total = n_rays_total
        self._unit_directions = unit_directions
        self._stratified_sampling = stratified_sampling
        # exposed like the reference raysampler (used for NDC pixel sizes
        # by the conical-frustum path, implicitron ray_sampler.py:177-180)
        self.min_x, self.max_x = min_x, max_x
        self.min_y, self.max_y = min_y, max_y
        ys, xs = jnp.meshgrid(
            jnp.linspace(min_y, max_y, image_height, dtype=jnp.float32),
            jnp.linspace(min_x, max_x, image_width, dtype=jnp.float32),
            indexing="ij",
        )
        self._xy_grid = jnp.stack([xs, ys], axis=-1)  # (H, W, 2)

    def __call__(
        self,
        cameras,
        *,
        mask: Optional[jnp.ndarray] = None,
        min_depth: Optional[float] = None,
        max_depth: Optional[float] = None,
        n_rays_per_image: Optional[int] = None,
        n_pts_per_ray: Optional[int] = None,
        stratified_sampling: Optional[bool] = None,
        n_rays_total: Optional[int] = None,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> RayBundle:
        """With ``n_rays_total`` set, samples a camera id per ray (uniform with
        replacement, reference raysampling.py:199-212 `_sample_cameras_and_masks`)
        and returns a HeterogeneousRayBundle of batch `n_rays_total` with one ray
        per row. Static-shape variant: `camera_ids` is the per-ray id vector
        (n_rays_total,) and `camera_counts` counts every original camera
        (len(cameras),) — the reference's dynamic unique-id compaction does not
        fit XLA."""
        B = cameras.R.shape[0]
        n_rays_total = n_rays_total or self._n_rays_total
        min_depth = min_depth if min_depth is not None else self._min_depth
        max_depth = max_depth if max_depth is not None else self._max_depth
        n_rays_per_image = (
            n_rays_per_image
            if n_rays_per_image is not None
            else self._n_rays_per_image
        )
        if n_rays_total:
            if n_rays_per_image:
                raise ValueError(
                    "`n_rays_total` and `n_rays_per_image` cannot both be defined."
                )
            if key is None:
                key = jax.random.PRNGKey(0)
            key_cam, key = jax.random.split(key)
            sampled_ids = jax.random.randint(key_cam, (n_rays_total,), 0, B)
            camera_counts = jnp.bincount(sampled_ids, length=B)
            cameras = cameras[sampled_ids]
            if mask is not None:
                mask = mask[sampled_ids]
            B = n_rays_total
            n_rays_per_image = 1
        n_pts_per_ray = (
            n_pts_per_ray if n_pts_per_ray is not None else self._n_pts_per_ray
        )
        stratified_sampling = (
            stratified_sampling
            if stratified_sampling is not None
            else self._stratified_sampling
        )
        if key is None:
            key = jax.random.PRNGKey(0)
        key_sel, key_strat = jax.random.split(key)

        xy_grid = jnp.broadcast_to(
            self._xy_grid[None], (B,) + self._xy_grid.shape
        )
        if n_rays_per_image is not None:
            flat = xy_grid.reshape(B, -1, 2)
            if mask is not None:
                # weighted (masked) choice per image
                w = mask.reshape(B, -1)
                logits = jnp.log(jnp.clip(w, 1e-12))
                idx = jax.vmap(
                    lambda k, lg: jax.random.categorical(
                        k, lg, shape=(n_rays_per_image,)
                    )
                )(jax.random.split(key_sel, B), logits)
                xy_grid = jax.vmap(lambda g, i: g[i])(flat, idx)
            else:
                xy_grid = _safe_multinomial_xy(key_sel, flat, n_rays_per_image)

        bundle = _xy_to_ray_bundle(
            cameras,
            xy_grid,
            min_depth,
            max_depth,
            n_pts_per_ray,
            self._unit_directions,
            stratified_sampling,
            key=key_strat,
        )
        if n_rays_total:
            # (n_rays_total, 1, ...) — reference `_pack_ray_bundle` shapes
            return HeterogeneousRayBundle(
                origins=bundle.origins,
                directions=bundle.directions,
                lengths=bundle.lengths,
                xys=bundle.xys,
                camera_ids=sampled_ids,
                camera_counts=camera_counts,
            )
        return bundle


class NDCMultinomialRaysampler(MultinomialRaysampler):
    """Grid raysampler over the full NDC range (reference :278)."""

    def __init__(
        self,
        *,
        image_width: int,
        image_height: int,
        n_pts_per_ray: int,
        min_depth: float,
        max_depth: float,
        n_rays_per_image: Optional[int] = None,
        n_rays_total: Optional[int] = None,
        unit_directions: bool = False,
        stratified_sampling: bool = False,
    ) -> None:
        if image_width >= image_height:
            range_x = image_width / image_height
            range_y = 1.0
        else:
            range_x = 1.0
            range_y = image_height / image_width
        half_pix_width = range_x / image_width
        half_pix_height = range_y / image_height
        super().__init__(
            min_x=range_x - half_pix_width,
            max_x=-range_x + half_pix_width,
            min_y=range_y - half_pix_height,
            max_y=-range_y + half_pix_height,
            image_width=image_width,
            image_height=image_height,
            n_pts_per_ray=n_pts_per_ray,
            min_depth=min_depth,
            max_depth=max_depth,
            n_rays_per_image=n_rays_per_image,
            n_rays_total=n_rays_total,
            unit_directions=unit_directions,
            stratified_sampling=stratified_sampling,
        )


# Reference aliases (renderer/implicit/raysampling.py:714-739)
def GridRaysampler(
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    image_width: int,
    image_height: int,
    n_pts_per_ray: int,
    min_depth: float,
    max_depth: float,
) -> "MultinomialRaysampler":
    """DEPRECATED positional-arg factory (reference raysampling.py:499);
    use MultinomialRaysampler."""
    import warnings

    warnings.warn(
        "GridRaysampler is deprecated, use MultinomialRaysampler instead.",
        PendingDeprecationWarning,
    )
    return MultinomialRaysampler(
        min_x=min_x, max_x=max_x, min_y=min_y, max_y=max_y,
        image_width=image_width, image_height=image_height,
        n_pts_per_ray=n_pts_per_ray, min_depth=min_depth,
        max_depth=max_depth,
    )


def NDCGridRaysampler(
    image_width: int,
    image_height: int,
    n_pts_per_ray: int,
    min_depth: float,
    max_depth: float,
) -> "NDCMultinomialRaysampler":
    """DEPRECATED positional-arg factory (reference raysampling.py:536);
    use NDCMultinomialRaysampler."""
    import warnings

    warnings.warn(
        "NDCGridRaysampler is deprecated, use NDCMultinomialRaysampler "
        "instead.",
        PendingDeprecationWarning,
    )
    return NDCMultinomialRaysampler(
        image_width=image_width, image_height=image_height,
        n_pts_per_ray=n_pts_per_ray, min_depth=min_depth,
        max_depth=max_depth,
    )


class MonteCarloRaysampler:
    """Uniform random rays in an xy range (reference :330)."""

    def __init__(
        self,
        min_x: float,
        max_x: float,
        min_y: float,
        max_y: float,
        n_rays_per_image: int,
        n_pts_per_ray: int,
        min_depth: float,
        max_depth: float,
        *,
        n_rays_total: Optional[int] = None,
        unit_directions: bool = False,
        stratified_sampling: bool = False,
    ) -> None:
        self._bounds = (min_x, max_x, min_y, max_y)
        self._n_rays_per_image = n_rays_per_image
        self._n_rays_total = n_rays_total
        self._n_pts_per_ray = n_pts_per_ray
        self._min_depth = min_depth
        self._max_depth = max_depth
        self._unit_directions = unit_directions
        self._stratified_sampling = stratified_sampling

    def __call__(
        self,
        cameras,
        *,
        stratified_sampling: Optional[bool] = None,
        n_rays_total: Optional[int] = None,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> RayBundle:
        B = cameras.R.shape[0]
        if key is None:
            key = jax.random.PRNGKey(0)
        n_rays_total = n_rays_total or self._n_rays_total
        n_rays_per_image = self._n_rays_per_image
        sampled_ids = camera_counts = None
        if n_rays_total:
            # static-shape variant of reference :375-387 (see
            # MultinomialRaysampler.__call__ docstring)
            key_cam, key = jax.random.split(key)
            sampled_ids = jax.random.randint(key_cam, (n_rays_total,), 0, B)
            camera_counts = jnp.bincount(sampled_ids, length=B)
            cameras = cameras[sampled_ids]
            B = n_rays_total
            n_rays_per_image = 1
        key_xy, key_strat = jax.random.split(key)
        min_x, max_x, min_y, max_y = self._bounds
        u = jax.random.uniform(
            key_xy, (B, n_rays_per_image, 2), jnp.float32
        )
        xy = jnp.stack(
            [
                u[..., 0] * (max_x - min_x) + min_x,
                u[..., 1] * (max_y - min_y) + min_y,
            ],
            axis=-1,
        )
        stratified_sampling = (
            stratified_sampling
            if stratified_sampling is not None
            else self._stratified_sampling
        )
        bundle = _xy_to_ray_bundle(
            cameras,
            xy,
            self._min_depth,
            self._max_depth,
            self._n_pts_per_ray,
            self._unit_directions,
            stratified_sampling,
            key=key_strat,
        )
        if n_rays_total:
            return HeterogeneousRayBundle(
                origins=bundle.origins,
                directions=bundle.directions,
                lengths=bundle.lengths,
                xys=bundle.xys,
                camera_ids=sampled_ids,
                camera_counts=camera_counts,
            )
        return bundle
