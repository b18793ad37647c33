"""Implicitron ray samplers.

Parity: reference implicitron/models/renderer/ray_sampler.py
(`RaySamplerBase` :23, `AbstractMaskRaySampler` :78, `AdaptiveRaySampler`
:269, `NearFarRaySampler` :312).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....renderer.implicit.raysampling import NDCMultinomialRaysampler
from ...tools.config import ReplaceableBase, registry
from .base import EvaluationMode, ImplicitronRayBundle, RenderSamplingMode


def compute_radii(
    cameras,
    xy_grid: jnp.ndarray,  # (B, ..., 2)
    pixel_hw_ndc: Tuple[float, float],
) -> jnp.ndarray:
    """World-space base radii of the conical frustums through each pixel
    (reference ray_sampler.py:335): unproject each pixel and its +1px x/y
    neighbors to the z=1 plane and take the footprint-matched radius
    (dx+dy)/sqrt(12)."""
    batch_size = xy_grid.shape[0]
    spatial_size = xy_grid.shape[1:-1]
    n_rays = 1
    for s in spatial_size:
        n_rays *= s
    xy = xy_grid.reshape(batch_size, n_rays, 2)
    xy3 = jnp.concatenate(
        [
            xy,
            xy + jnp.asarray([pixel_hw_ndc[1], 0.0], xy.dtype),
            xy + jnp.asarray([0.0, pixel_hw_ndc[0]], xy.dtype),
        ],
        axis=1,
    )
    xyz = jnp.concatenate(
        [xy3, jnp.ones((batch_size, 3 * n_rays, 1), xy.dtype)], axis=-1
    )
    unprojected = cameras.unproject_points(xyz, from_ndc=True)
    plane, plane_dx, plane_dy = jnp.split(unprojected, 3, axis=1)
    dx_norm = jnp.linalg.norm(plane_dx - plane, axis=-1, keepdims=True)
    dy_norm = jnp.linalg.norm(plane_dy - plane, axis=-1, keepdims=True)
    radii = (dx_norm + dy_norm) / 12**0.5
    return radii.reshape((batch_size,) + spatial_size + (1,))


class RaySamplerBase(ReplaceableBase):
    def __call__(self, cameras, evaluation_mode, mask=None, key=None):
        raise NotImplementedError


@dataclasses.dataclass
class AbstractMaskRaySampler(RaySamplerBase):
    """Train: masked MC rays; eval: full grid (reference :78)."""

    image_width: int = 400
    image_height: int = 400
    sampling_mode_training: str = "mask_sample"
    sampling_mode_evaluation: str = "full_grid"
    n_pts_per_ray_training: int = 64
    n_pts_per_ray_evaluation: int = 64
    n_rays_per_image_sampled_from_mask: int = 1024
    n_rays_total_training: Optional[int] = None
    stratified_point_sampling_training: bool = True
    stratified_point_sampling_evaluation: bool = False
    cast_ray_bundle_as_cone: bool = False

    def __post_init__(self):
        self._sampling_mode = {
            EvaluationMode.TRAINING: RenderSamplingMode(
                self.sampling_mode_training
            ),
            EvaluationMode.EVALUATION: RenderSamplingMode(
                self.sampling_mode_evaluation
            ),
        }
        if (
            self.n_rays_total_training is not None
            and self._sampling_mode[EvaluationMode.TRAINING]
            != RenderSamplingMode.MASK_SAMPLE
        ):
            raise ValueError(
                "n_rays_total_training requires sampling_mode_training="
                "'mask_sample'"
            )
        # conical frustums sample bin EDGES: one extra point per ray
        # (reference ray_sampler.py:134-143)
        extra = 1 if self.cast_ray_bundle_as_cone else 0
        if self.cast_ray_bundle_as_cone and self.n_rays_total_training:
            raise TypeError(
                "Heterogeneous ray bundle is not supported for conical "
                "frustum computation yet"
            )
        self._training_raysampler = NDCMultinomialRaysampler(
            image_width=self.image_width,
            image_height=self.image_height,
            n_pts_per_ray=self.n_pts_per_ray_training + extra,
            min_depth=0.0,
            max_depth=0.0,
            n_rays_per_image=self.n_rays_per_image_sampled_from_mask
            if self._sampling_mode[EvaluationMode.TRAINING]
            == RenderSamplingMode.MASK_SAMPLE
            and self.n_rays_total_training is None
            else None,
            n_rays_total=self.n_rays_total_training,
            unit_directions=True,
            stratified_sampling=self.stratified_point_sampling_training,
        )
        self._evaluation_raysampler = NDCMultinomialRaysampler(
            image_width=self.image_width,
            image_height=self.image_height,
            n_pts_per_ray=self.n_pts_per_ray_evaluation + extra,
            min_depth=0.0,
            max_depth=0.0,
            n_rays_per_image=None,
            unit_directions=True,
            stratified_sampling=self.stratified_point_sampling_evaluation,
        )

    def _get_min_max_depth_bounds(self, cameras) -> Tuple[float, float]:
        raise NotImplementedError

    def __call__(
        self,
        cameras,
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        mask: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
    ) -> ImplicitronRayBundle:
        sample_mask = None
        if (
            self._sampling_mode[evaluation_mode] == RenderSamplingMode.MASK_SAMPLE
            and mask is not None
        ):
            sample_mask = mask
        min_depth, max_depth = self._get_min_max_depth_bounds(cameras)
        raysampler = {
            EvaluationMode.TRAINING: self._training_raysampler,
            EvaluationMode.EVALUATION: self._evaluation_raysampler,
        }[evaluation_mode]
        bundle = raysampler(
            cameras,
            mask=sample_mask,
            min_depth=min_depth,
            max_depth=max_depth,
            key=key,
        )
        if self.cast_ray_bundle_as_cone:
            # sampled points are bin EDGES; lengths become midpoints
            # (the reference stores bins and derives lengths lazily,
            # base.py:108 — our dataclass stores both explicitly)
            pixel_hw = (
                abs(self._training_raysampler.max_y
                    - self._training_raysampler.min_y)
                / max(self.image_height - 1, 1),
                abs(self._training_raysampler.max_x
                    - self._training_raysampler.min_x)
                / max(self.image_width - 1, 1),
            )
            pixel_radii_2d = compute_radii(
                cameras, bundle.xys[..., :2], pixel_hw
            )
            bins = bundle.lengths
            return ImplicitronRayBundle(
                origins=bundle.origins,
                directions=bundle.directions,
                lengths=0.5 * (bins[..., 1:] + bins[..., :-1]),
                xys=bundle.xys,
                bins=bins,
                pixel_radii_2d=pixel_radii_2d,
            )
        return ImplicitronRayBundle(
            origins=bundle.origins,
            directions=bundle.directions,
            lengths=bundle.lengths,
            xys=bundle.xys,
            camera_ids=getattr(bundle, "camera_ids", None),
            camera_counts=getattr(bundle, "camera_counts", None),
        )


@registry.register
@dataclasses.dataclass
class AdaptiveRaySampler(AbstractMaskRaySampler):
    """Depth range scaled by scene extent around the origin (reference :269)."""

    scene_extent: float = 8.0
    scene_center: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def __post_init__(self):
        super().__post_init__()

    def _get_min_max_depth_bounds(self, cameras) -> Tuple[float, float]:
        center = jnp.asarray(self.scene_center)
        cam_center = cameras.get_camera_center()
        dist = jnp.linalg.norm(cam_center - center, axis=-1)
        d = jnp.mean(dist)  # traced-safe (no float() under jit)
        return jnp.maximum(d - self.scene_extent, 1e-3), d + self.scene_extent


@registry.register
@dataclasses.dataclass
class NearFarRaySampler(AbstractMaskRaySampler):
    """Fixed near/far bounds (reference :312)."""

    min_depth: float = 0.1
    max_depth: float = 8.0

    def __post_init__(self):
        super().__post_init__()

    def _get_min_max_depth_bounds(self, cameras) -> Tuple[float, float]:
        return self.min_depth, self.max_depth
