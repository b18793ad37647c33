"""ViewPooler = ViewSampler + FeatureAggregator.

Parity: reference implicitron/models/view_pooler/view_pooler.py:19.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from ...tools.config import Configurable, registry, run_auto_creation
from .feature_aggregator import (
    AngleWeightedIdentityFeatureAggregator,
    FeatureAggregatorBase,
    ReductionFeatureAggregator,
    _ray_angle_weights,
)
from .view_sampler import ViewSampler


@dataclasses.dataclass
class ViewPooler(Configurable):
    view_sampler_args: Dict[str, Any] = dataclasses.field(default_factory=dict)
    feature_aggregator_class_type: str = "ReductionFeatureAggregator"
    feature_aggregator_args: Dict[str, Any] = dataclasses.field(
        default_factory=dict
    )

    def __post_init__(self):
        self.view_sampler = ViewSampler(**self.view_sampler_args)
        agg_cls = registry.get(
            FeatureAggregatorBase, self.feature_aggregator_class_type
        )
        self.feature_aggregator = agg_cls(**self.feature_aggregator_args)

    def get_aggregated_feature_dim(self, feats_dim: int, n_views: int) -> int:
        return self.feature_aggregator.get_aggregated_feature_dim(
            feats_dim, n_views
        )

    def has_aggregation(self) -> bool:
        """False for identity-type aggregators that keep the view axis
        (reference view_pooler.py `has_aggregation`)."""
        return "Identity" not in self.feature_aggregator_class_type

    def __call__(
        self, *, pts, seq_id_pts=None, camera=None, seq_id_camera=None,
        feats=None, masks=None, **kwargs,
    ):
        sampled, sample_masks = self.view_sampler(
            pts, seq_id_pts, camera, seq_id_camera, feats, masks
        )
        return self.feature_aggregator(
            sampled, sample_masks, camera=camera, pts=pts, **kwargs
        )

    def sample_per_view(
        self, *, pts, camera=None, feats=None, masks=None, **kwargs,
    ):
        """Per-view sampled features WITHOUT view aggregation, for implicit
        functions with requires_pooling_without_aggregation (reference
        NeRFormer): returns a dict of (V, P, C) tensors and (V, P, 1)
        masks; identity-type aggregator weights (e.g. ray-angle) are
        applied but the view axis is kept."""
        sampled, sample_masks = self.view_sampler(
            pts, None, camera, None, feats, masks
        )
        agg = self.feature_aggregator
        w = sample_masks
        if isinstance(agg, AngleWeightedIdentityFeatureAggregator):
            w = w * _ray_angle_weights(
                camera, pts, agg.min_ray_angle_weight,
                agg.weight_by_ray_angle_gamma,
            )
        return {k: f * w for k, f in sampled.items()}, sample_masks
