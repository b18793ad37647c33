"""Replaceable base for implicitron models.

Parity: reference implicitron/models/base_model.py
(`ImplicitronRender` :22, `ImplicitronModelBase` :50): the model
contract of the trainer — `__call__` with the FrameData-shaped keyword
batch returning a `preds` dict which includes an `ImplicitronRender`
under ``preds["implicitron_render"]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..tools.config import ReplaceableBase
from .renderer.base import EvaluationMode


@dataclasses.dataclass
class ImplicitronRender:
    """The tensors describing one render (reference base_model.py:22)."""

    depth_render: Optional[jnp.ndarray] = None
    image_render: Optional[jnp.ndarray] = None
    mask_render: Optional[jnp.ndarray] = None
    camera_distance: Optional[jnp.ndarray] = None

    def clone(self) -> "ImplicitronRender":
        def safe_clone(t):
            return jax.lax.stop_gradient(t) if t is not None else None

        return ImplicitronRender(
            depth_render=safe_clone(self.depth_render),
            image_render=safe_clone(self.image_render),
            mask_render=safe_clone(self.mask_render),
            camera_distance=safe_clone(self.camera_distance),
        )


class ImplicitronModelBase(ReplaceableBase):
    """Replaceable abstract base for image-generation models
    (reference base_model.py:50). Implementations are flax modules whose
    `__call__` takes the keyword batch below and returns a `preds` dict
    with an `ImplicitronRender` at ``preds["implicitron_render"]``."""

    log_vars: List[str] = ["objective"]

    def __call__(
        self,
        *,
        image_rgb: Optional[jnp.ndarray] = None,  # (B, H, W, 3)
        camera=None,
        fg_probability: Optional[jnp.ndarray] = None,  # (B, H, W, 1)
        mask_crop: Optional[jnp.ndarray] = None,
        depth_map: Optional[jnp.ndarray] = None,
        sequence_name: Optional[List[str]] = None,
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        **kwargs,
    ) -> Dict[str, Any]:
        raise NotImplementedError()
