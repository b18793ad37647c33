"""Aggregate per-source-view sampled features.

Parity: reference implicitron/models/view_pooler/feature_aggregator.py
(`IdentityFeatureAggregator`, `ReductionFeatureAggregator`,
`AngleWeightedReductionFeatureAggregator`).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Optional, Sequence

import jax.numpy as jnp

from ...tools.config import ReplaceableBase, registry


class ReductionFunction(enum.Enum):
    """View-reduction choices (reference feature_aggregator.py:23); the
    aggregators also accept the raw string values."""

    AVG = "avg"
    MAX = "max"
    STD = "std"
    STD_AVG = "std_avg"


class FeatureAggregatorBase(ReplaceableBase):
    exclude_target_view: bool = True

    def get_aggregated_feature_dim(self, feats, dim: int) -> int:
        raise NotImplementedError


def _masked_mean_std(x, mask, axis):
    w = jnp.clip(jnp.sum(mask, axis=axis), 1e-4)
    mean = jnp.sum(x * mask, axis=axis) / w
    var = jnp.sum(((x - jnp.expand_dims(mean, axis)) ** 2) * mask, axis=axis) / w
    return mean, jnp.sqrt(jnp.clip(var, 1e-8))


@registry.register
@dataclasses.dataclass
class IdentityFeatureAggregator(FeatureAggregatorBase):
    """Concatenate over views without reduction (reference)."""

    def get_aggregated_feature_dim(self, feats_dim: int, n_views: int) -> int:
        return feats_dim * n_views

    def __call__(self, feats_sampled: Dict, masks_sampled, **kwargs):
        out = {}
        for name, f in feats_sampled.items():  # (V, P, C)
            V, P, C = f.shape
            out[name] = jnp.moveaxis(f * masks_sampled, 0, 1).reshape(
                P, V * C
            )[None]
        return out


@registry.register
@dataclasses.dataclass
class ReductionFeatureAggregator(FeatureAggregatorBase):
    """Mean/std/max reduction over source views (reference)."""

    reduction_functions: Sequence = ("avg", "std")

    def _reduction_names(self):
        return [
            r.value if isinstance(r, ReductionFunction) else str(r)
            for r in self.reduction_functions
        ]

    def get_aggregated_feature_dim(self, feats_dim: int, n_views: int) -> int:
        return feats_dim * len(self.reduction_functions)

    def __call__(self, feats_sampled: Dict, masks_sampled, **kwargs):
        out = {}
        for name, f in feats_sampled.items():  # (V, P, C)
            parts = []
            mean, std = _masked_mean_std(f, masks_sampled, axis=0)
            for red in self._reduction_names():
                if red == "avg":
                    parts.append(mean)
                elif red == "std":
                    parts.append(std)
                elif red == "std_avg":
                    parts.append(
                        jnp.broadcast_to(
                            std.mean(axis=-1, keepdims=True),
                            std.shape[:-1] + (1,),
                        )
                    )
                elif red == "max":
                    parts.append(
                        jnp.max(
                            jnp.where(masks_sampled > 0, f, -jnp.inf), axis=0
                        )
                    )
                else:
                    raise ValueError(f"unknown reduction {red}")
            out[name] = jnp.concatenate(parts, axis=-1)[None]  # (1, P, C*k)
        return out


def _ray_angle_weights(camera, pts, min_w: float, gamma: float):
    """(V, P, 1) weights from source-ray vs reference-ray agreement
    (reference _get_angular_reduction_weights semantics)."""
    centers = camera.get_camera_center()  # (V, 3)
    p = pts.reshape(-1, 3)  # (P, 3)
    view_dirs = p[None] - centers[:, None]  # (V, P, 3)
    view_dirs = view_dirs / jnp.clip(
        jnp.linalg.norm(view_dirs, axis=-1, keepdims=True), 1e-8
    )
    ref = view_dirs[:1]
    cos = jnp.sum(view_dirs * ref, axis=-1)[..., None]
    return jnp.clip(0.5 * (cos + 1.0), min_w) ** gamma


@registry.register
@dataclasses.dataclass
class AngleWeightedIdentityFeatureAggregator(FeatureAggregatorBase):
    """Per-view features reweighted by ray-angle agreement, concatenated
    without reduction (reference feature_aggregator.py:350
    `AngleWeightedIdentityFeatureAggregator`)."""

    weight_by_ray_angle_gamma: float = 1.0
    min_ray_angle_weight: float = 0.1

    def get_aggregated_feature_dim(self, feats_dim: int, n_views: int) -> int:
        return feats_dim * n_views

    def __call__(
        self, feats_sampled: Dict, masks_sampled, camera=None, pts=None,
        **kwargs,
    ):
        if camera is None or pts is None:
            raise ValueError(
                "camera and pts are required for angle weighted aggregation"
            )
        w = _ray_angle_weights(
            camera, pts, self.min_ray_angle_weight,
            self.weight_by_ray_angle_gamma,
        )
        out = {}
        for name, f in feats_sampled.items():  # (V, P, C)
            V, P, C = f.shape
            out[name] = jnp.moveaxis(f * masks_sampled * w, 0, 1).reshape(
                P, V * C
            )[None]
        return out


@registry.register
@dataclasses.dataclass
class AngleWeightedReductionFeatureAggregator(ReductionFeatureAggregator):
    """Reduction weighted by view-direction agreement (reference)."""

    weight_by_ray_angle_gamma: float = 1.0
    min_ray_angle_weight: float = 0.1

    def __call__(
        self, feats_sampled: Dict, masks_sampled, camera=None, pts=None,
        **kwargs,
    ):
        if camera is not None and pts is not None:
            masks_sampled = masks_sampled * _ray_angle_weights(
                camera, pts, self.min_ray_angle_weight,
                self.weight_by_ray_angle_gamma,
            )
        return super().__call__(feats_sampled, masks_sampled, **kwargs)
