"""Renderer base types for Implicitron.

Parity: reference implicitron/models/renderer/base.py
(`BaseRenderer` :219, `ImplicitronRayBundle` :32, `RendererOutput` :170,
`EvaluationMode` :25).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, List, Optional

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
