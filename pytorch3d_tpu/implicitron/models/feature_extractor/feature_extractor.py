"""Feature extractor base.

Parity: reference implicitron/models/feature_extractor/
feature_extractor.py:15 (`FeatureExtractorBase`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from ...tools.config import ReplaceableBase


class FeatureExtractorBase(ReplaceableBase):
    """Extracts a dict of feature maps from images (reference :15).
    Implementations are flax modules returning `{name: (B, C_i, H_i,
    W_i)}` pyramids."""

    def get_feat_dims(self) -> int:
        """Total number of output feature dimensions (sum over maps)."""
        raise NotImplementedError

    def __call__(
        self,
        imgs: Optional[jnp.ndarray],
        masks: Optional[jnp.ndarray] = None,
        **kwargs,
    ) -> Dict[Any, jnp.ndarray]:
        raise NotImplementedError
