"""Renderer base types for Implicitron.

Parity: reference implicitron/models/renderer/base.py
(`BaseRenderer` :219, `ImplicitronRayBundle` :32, `RendererOutput` :170,
`EvaluationMode` :25).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import struct

from ...tools.config import ReplaceableBase


class EvaluationMode(enum.Enum):
    TRAINING = "training"
    EVALUATION = "evaluation"


class RenderSamplingMode(enum.Enum):
    MASK_SAMPLE = "mask_sample"
    FULL_GRID = "full_grid"


@struct.dataclass
class ImplicitronRayBundle:
    """Rays with (..., S) lengths + optional weights/camera bookkeeping
    (reference base.py:32)."""

    origins: jnp.ndarray
    directions: jnp.ndarray
    lengths: jnp.ndarray
    xys: jnp.ndarray
    camera_ids: Optional[jnp.ndarray] = None
    camera_counts: Optional[jnp.ndarray] = None
    bins: Optional[jnp.ndarray] = None
    pixel_radii_2d: Optional[jnp.ndarray] = None

    def is_packed(self) -> bool:
        """True for heterogeneous (one-ray-per-row) bundles (reference
        implicitron/models/renderer/base.py ImplicitronRayBundle.is_packed)."""
        return self.camera_ids is not None and self.camera_counts is not None


@dataclasses.dataclass
class RendererOutput:
    """Per-pass render output, chained via `prev_stage`
    (reference base.py:170).  Registered as a JAX pytree so it can cross
    jit boundaries."""

    features: jnp.ndarray
    depths: jnp.ndarray
    masks: jnp.ndarray
    prev_stage: Optional["RendererOutput"] = None
    normals: Optional[jnp.ndarray] = None
    points: Optional[jnp.ndarray] = None
    weights: Optional[jnp.ndarray] = None
    aux: Dict[str, Any] = dataclasses.field(default_factory=dict)


import jax  # noqa: E402

jax.tree_util.register_dataclass(
    RendererOutput,
    data_fields=[
        "features", "depths", "masks", "prev_stage", "normals", "points",
        "weights", "aux",
    ],
    meta_fields=[],
)


class BaseRenderer(ReplaceableBase):
    """Renderer plugin base (reference base.py:219)."""

    def requires_object_mask(self) -> bool:
        return False

    def __call__(
        self,
        ray_bundle: ImplicitronRayBundle,
        implicit_functions: List,
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        **kwargs,
    ) -> RendererOutput:
        raise NotImplementedError


class ImplicitFunctionWrapper:
    """Binds extra keyword args to an implicit function for the duration
    of a render pass (reference base.py:202)."""

    def __init__(self, fn) -> None:
        self._fn = fn
        self.bound_args: Dict[str, Any] = {}

    def bind_args(self, **bound_args) -> None:
        self.bound_args = bound_args
        on_bind = getattr(self._fn, "on_bind_args", None)
        if on_bind is not None:
            on_bind()

    def unbind_args(self) -> None:
        self.bound_args = {}

    def __call__(self, *args, **kwargs):
        return self._fn(*args, **{**kwargs, **self.bound_args})


# --------------------------------------------------------------------------- #
# mip-NeRF conical-frustum Gaussians (reference base.py:280-427)
# --------------------------------------------------------------------------- #


def compute_3d_diagonal_covariance_gaussian(
    rays_directions: jnp.ndarray,  # (..., 3)
    rays_dir_variance: jnp.ndarray,  # (..., num_intervals)
    radii_variance: jnp.ndarray,  # (..., num_intervals)
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Diagonal covariances of frustum Gaussians in world coordinates
    (mip-NeRF eq. 16; reference base.py:280)."""
    d_outer_diag = rays_directions**2
    dir_mag_sq = jnp.clip(
        jnp.sum(d_outer_diag, axis=-1, keepdims=True), eps
    )
    null_outer_diag = 1 - d_outer_diag / dir_mag_sq
    ray_dir_cov_diag = rays_dir_variance[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = radii_variance[..., None] * null_outer_diag[..., None, :]
    return ray_dir_cov_diag + xy_cov_diag


def approximate_conical_frustum_as_gaussians(
    bins: jnp.ndarray,  # (..., num_points_per_ray + 1)
    radii: jnp.ndarray,  # (..., 1)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable mean/variance of a conical frustum along the ray and of its
    radius (mip-NeRF eq. 7; reference base.py:313)."""
    t_mu = 0.5 * (bins[..., 1:] + bins[..., :-1])
    t_delta = jnp.diff(bins, axis=-1) / 2

    t_mu_pow2 = t_mu**2
    t_delta_pow2 = t_delta**2
    t_delta_pow4 = t_delta**4
    den = 3 * t_mu_pow2 + t_delta_pow2

    rays_dir_mean = t_mu + 2 * t_mu * t_delta_pow2 / den
    rays_dir_variance = t_delta_pow2 / 3 - (4 / 15) * (
        t_delta_pow4 * (12 * t_mu_pow2 - t_delta_pow2) / den**2
    )
    radii_variance = radii**2 * (
        t_mu_pow2 / 4 + (5 / 12) * t_delta_pow2 - 4 / 15 * t_delta_pow4 / den
    )
    return rays_dir_mean, rays_dir_variance, radii_variance


def conical_frustum_to_gaussian(
    ray_bundle: ImplicitronRayBundle,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(means, diag covariances) of the Gaussians approximating the
    conical frustums of a cone-cast ray bundle (reference base.py:382)."""
    if ray_bundle.pixel_radii_2d is None or ray_bundle.bins is None:
        raise ValueError(
            "RayBundle pixel_radii_2d or bins have not been provided. "
            "Have you forgotten to set `cast_ray_bundle_as_cone` to True?"
        )
    (
        rays_dir_mean,
        rays_dir_variance,
        radii_variance,
    ) = approximate_conical_frustum_as_gaussians(
        ray_bundle.bins, ray_bundle.pixel_radii_2d
    )
    means = (
        ray_bundle.origins[..., None, :]
        + rays_dir_mean[..., None] * ray_bundle.directions[..., None, :]
    )
    diag_covariances = compute_3d_diagonal_covariance_gaussian(
        ray_bundle.directions, rays_dir_variance, radii_variance
    )
    return means, diag_covariances
