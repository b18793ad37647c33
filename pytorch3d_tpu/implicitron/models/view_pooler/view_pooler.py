"""ViewPooler = ViewSampler + FeatureAggregator.

Parity: reference implicitron/models/view_pooler/view_pooler.py:19.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from ...tools.config import Configurable, registry, run_auto_creation
from .feature_aggregator import (
    FeatureAggregatorBase,
    ReductionFeatureAggregator,
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
