"""FrameData: the unit record of Implicitron datasets.

Parity: reference implicitron/dataset/frame_data.py:58 (`FrameData`
dataclass) — images channels-last here (TPU-friendly layout), cameras are
our PerspectiveCameras pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Union

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FrameData:
    frame_number: Optional[Union[int, np.ndarray]] = None
    sequence_name: Optional[Union[str, List[str]]] = None
    sequence_category: Optional[Union[str, List[str]]] = None
    frame_timestamp: Optional[jnp.ndarray] = None
    image_size_hw: Optional[jnp.ndarray] = None
    effective_image_size_hw: Optional[jnp.ndarray] = None
    image_path: Optional[Union[str, List[str]]] = None
    image_rgb: Optional[jnp.ndarray] = None  # (N, H, W, 3)
    mask_crop: Optional[jnp.ndarray] = None  # (N, H, W, 1)
    depth_path: Optional[Union[str, List[str]]] = None
    depth_map: Optional[jnp.ndarray] = None  # (N, H, W, 1)
    depth_mask: Optional[jnp.ndarray] = None
    mask_path: Optional[Union[str, List[str]]] = None
    fg_probability: Optional[jnp.ndarray] = None  # (N, H, W, 1)
    bbox_xywh: Optional[jnp.ndarray] = None
    crop_bbox_xywh: Optional[jnp.ndarray] = None
    camera: Optional[Any] = None
    camera_quality_score: Optional[jnp.ndarray] = None
    point_cloud_quality_score: Optional[jnp.ndarray] = None
    sequence_point_cloud_path: Optional[Union[str, List[str]]] = None
    sequence_point_cloud: Optional[Any] = None
    sequence_point_cloud_idx: Optional[jnp.ndarray] = None
    frame_type: Optional[Union[str, List[str]]] = None
    meta: dict = dataclasses.field(default_factory=dict)

    def keys(self):
        return [f.name for f in dataclasses.fields(self)]

    def __getitem__(self, k):
        return getattr(self, k)

    @classmethod
    def collate(cls, batch: List["FrameData"]) -> "FrameData":
        """Stack a list of single-frame FrameData into a batch."""
        import jax

        out = {}
        for f in dataclasses.fields(cls):
            vals = [getattr(b, f.name) for b in batch]
            if all(v is None for v in vals):
                out[f.name] = None
            elif isinstance(vals[0], jnp.ndarray):
                out[f.name] = jnp.concatenate(vals, axis=0)
            elif isinstance(vals[0], (str,)):
                out[f.name] = [v for v in vals]
            elif f.name == "camera" and vals[0] is not None:
                from ...renderer.camera_utils import join_cameras_as_batch

                out[f.name] = join_cameras_as_batch(vals)
            else:
                out[f.name] = vals
        return cls(**out)
