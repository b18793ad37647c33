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


class FrameDataBuilderBase:
    """Replaceable base for FrameData builders (reference
    frame_data.py:718)."""

    def build(
        self, frame_annotation, sequence_annotation=None, **kwargs
    ) -> "FrameData":
        raise NotImplementedError


@dataclasses.dataclass
class GenericFrameDataBuilder(FrameDataBuilderBase):
    """Loads blobs and runs the geometry pipeline: optional mask-driven
    box crop with camera refocus, aspect-preserving resize with zero
    padding + mask_crop, camera rescale (reference frame_data.py:745,
    `build` :791).

    `frame_annotation` is a CO3D-style dict ({"sequence_name", "image":
    {"path", "size"}, "mask": {"path"}, "depth": {"path",
    "scale_adjustment"}, "viewpoint": {...}}) or a
    `types.FrameAnnotation` (converted via dataclasses.asdict)."""

    dataset_root: str = ""
    load_images: bool = True
    load_depths: bool = True
    load_depth_masks: bool = True
    load_masks: bool = True
    image_height: Optional[int] = 256
    image_width: Optional[int] = 256
    box_crop: bool = False
    box_crop_mask_thr: float = 0.4
    box_crop_context: float = 0.3

    def _resolve(self, path: str) -> str:
        import os

        return (
            os.path.join(self.dataset_root, path)
            if self.dataset_root
            else path
        )

    def _load_image_hwc(self, path: str):
        import os
        import warnings

        if not self.load_images or not path:
            return None
        from PIL import Image

        p = self._resolve(path)
        if not os.path.isfile(p):
            warnings.warn(f"image not found: {p}")
            return None
        im = Image.open(p).convert("RGB")
        return np.asarray(im, np.float32) / 255.0

    def _load_mask_hwc(self, path: str):
        import os

        if not self.load_masks or not path:
            return None
        from PIL import Image

        p = self._resolve(path)
        if not os.path.isfile(p):
            return None
        im = Image.open(p).convert("L")
        return (np.asarray(im, np.float32) / 255.0)[..., None]

    def _load_depth_hwc(self, entry):
        import os

        if not self.load_depths:
            return None
        d = entry.get("depth") or {}
        path = d.get("path", "")
        if not path:
            return None
        p = self._resolve(path)
        if not os.path.isfile(p):
            return None
        from PIL import Image

        im = Image.open(p)
        depth = np.asarray(im, np.float32)
        if depth.ndim == 3:
            depth = depth[..., 0]
        scale = float(d.get("scale_adjustment", 1.0))
        return (depth * scale)[..., None]

    def build(
        self, frame_annotation, sequence_annotation=None, **kwargs
    ) -> "FrameData":
        from ...renderer.cameras import PerspectiveCameras
        from . import utils as du

        entry = frame_annotation
        if dataclasses.is_dataclass(entry) and not isinstance(entry, type):
            entry = dataclasses.asdict(entry)
        sequence_category = kwargs.get("sequence_category")
        if sequence_category is None and sequence_annotation is not None:
            seq = sequence_annotation
            if dataclasses.is_dataclass(seq) and not isinstance(seq, type):
                seq = dataclasses.asdict(seq)
            sequence_category = seq.get("category", "default")
        if sequence_category is None:
            sequence_category = "default"

        vp = entry.get("viewpoint") or {}
        camera = None
        if vp:
            camera = PerspectiveCameras.create(
                R=jnp.asarray(vp["R"], jnp.float32)[None],
                T=jnp.asarray(vp["T"], jnp.float32)[None],
                focal_length=jnp.asarray(
                    vp["focal_length"], jnp.float32
                )[None],
                principal_point=jnp.asarray(
                    vp["principal_point"], jnp.float32
                )[None],
            )
        image = self._load_image_hwc((entry.get("image") or {}).get("path", ""))
        mask = self._load_mask_hwc((entry.get("mask") or {}).get("path", ""))
        depth = self._load_depth_hwc(entry)

        bbox_xywh = None
        crop_bbox_xywh = None
        if self.box_crop and mask is not None and image is not None:
            bbox_xywh = np.asarray(
                du.get_bbox_from_mask(mask[..., 0], self.box_crop_mask_thr),
                np.float64,
            )
            bbox_xyxy = du.get_clamp_bbox(
                bbox_xywh,
                box_crop_context=self.box_crop_context,
                image_path=(entry.get("image") or {}).get("path", ""),
            )
            clamped = du.clamp_box_to_image_bounds_and_round(
                bbox_xyxy, image.shape[:2]
            )
            crop_bbox_xywh = du.bbox_xyxy_to_xywh(clamped)
            pre_crop_wh = (image.shape[1], image.shape[0])
            image = du.crop_around_box(image, clamped)
            mask = du.crop_around_box(mask, clamped)
            if depth is not None:
                depth = du.crop_around_box(depth, clamped)
            if camera is not None:
                camera = du.adjust_camera_to_bbox_crop(
                    camera, pre_crop_wh, crop_bbox_xywh
                )

        mask_crop = None
        if image is not None:
            H = self.image_height or image.shape[0]
            W = self.image_width or image.shape[1]
            pre_hw = image.shape[:2]
            image, scale, mask_crop = du.resize_image(image, H, W)
            if mask is not None:
                mask, _, _ = du.resize_image(mask, H, W, mode="nearest")
            if depth is not None:
                depth, _, _ = du.resize_image(depth, H, W, mode="nearest")
            if camera is not None:
                camera = du.adjust_camera_to_image_scale(
                    camera, (pre_hw[1], pre_hw[0]), (W, H)
                )

        return FrameData(
            frame_number=entry.get("frame_number"),
            sequence_name=entry["sequence_name"],
            sequence_category=sequence_category,
            image_rgb=None if image is None else jnp.asarray(image)[None],
            fg_probability=None if mask is None else jnp.asarray(mask)[None],
            depth_map=None if depth is None else jnp.asarray(depth)[None],
            mask_crop=(
                None if mask_crop is None else jnp.asarray(mask_crop)[None]
            ),
            bbox_xywh=(None if bbox_xywh is None else jnp.asarray(bbox_xywh)),
            crop_bbox_xywh=(
                None
                if crop_bbox_xywh is None
                else jnp.asarray(crop_bbox_xywh)
            ),
            camera=camera,
            image_path=(entry.get("image") or {}).get("path"),
            mask_path=(entry.get("mask") or {}).get("path"),
            frame_type=entry.get("meta", {}).get("frame_type")
            if isinstance(entry.get("meta"), dict)
            else None,
        )


@dataclasses.dataclass
class FrameDataBuilder(GenericFrameDataBuilder):
    """The default builder (reference frame_data.py:887)."""
