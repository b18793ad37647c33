"""CO3D-style JSON-index dataset.

Parity: reference implicitron/dataset/json_index_dataset.py:59
(`JsonIndexDataset`): frame/sequence annotations in (gzipped) json, lazy
image/mask/depth loading, frame filtering.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import json
import os
import warnings
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ...renderer.cameras import PerspectiveCameras
from ..tools.config import registry
from .dataset_base import DatasetBase
from .frame_data import FrameData


def _load_json(path: str):
    if path.endswith(".jgz") or path.endswith(".gz"):
        with gzip.open(path, "rt", encoding="utf8") as f:
            return json.load(f)
    with open(path) as f:
        return json.load(f)


@registry.register
@dataclasses.dataclass
class JsonIndexDataset(DatasetBase):
    """Load CO3D-format frame/sequence annotation files (reference :59).

    Annotation schema per frame (CO3D `types.FrameAnnotation`):
    sequence_name, frame_number, image: {path, size}, mask: {path},
    depth: {path, scale_adjustment}, viewpoint: {R, T, focal_length,
    principal_point}.
    """

    frame_annotations_file: str = ""
    sequence_annotations_file: str = ""
    subset_lists_file: str = ""
    subsets: Optional[List[str]] = None
    dataset_root: str = ""
    limit_to: int = 0
    limit_sequences_to: int = 0
    pick_sequence: tuple = ()
    exclude_sequence: tuple = ()
    limit_category_to: tuple = ()
    load_images: bool = True
    load_depths: bool = True
    load_depth_masks: bool = True
    load_masks: bool = True
    image_height: Optional[int] = 256
    image_width: Optional[int] = 256
    box_crop: bool = False
    box_crop_context: float = 0.3
    box_crop_mask_thr: float = 0.4
    remove_empty_masks: bool = False
    n_frames_per_sequence: int = -1
    seed: int = 0
    sort_frames: bool = False

    def __post_init__(self):
        self._frame_annots: List[Dict[str, Any]] = []
        self._seq_annots: Dict[str, Dict[str, Any]] = {}
        self.eval_batches: Optional[List[List[int]]] = None
        if self.frame_annotations_file:
            self._load_annotations()

    def _load_annotations(self):
        frame_annots = _load_json(self.frame_annotations_file)
        if self.sequence_annotations_file:
            seq_annots = _load_json(self.sequence_annotations_file)
            self._seq_annots = {s["sequence_name"]: s for s in seq_annots}

        # sequence-level filters
        def seq_ok(name):
            if self.pick_sequence and name not in self.pick_sequence:
                return False
            if name in self.exclude_sequence:
                return False
            if self.limit_category_to:
                cat = self._seq_annots.get(name, {}).get("category")
                if cat not in self.limit_category_to:
                    return False
            return True

        frame_annots = [f for f in frame_annots if seq_ok(f["sequence_name"])]

        if self.limit_sequences_to > 0:
            keep = sorted({f["sequence_name"] for f in frame_annots})[
                : self.limit_sequences_to
            ]
            frame_annots = [
                f for f in frame_annots if f["sequence_name"] in set(keep)
            ]

        if self.n_frames_per_sequence > 0:
            rng = np.random.RandomState(self.seed)
            by_seq: Dict[str, List] = {}
            for f in frame_annots:
                by_seq.setdefault(f["sequence_name"], []).append(f)
            frame_annots = []
            for seq, frames in by_seq.items():
                if len(frames) > self.n_frames_per_sequence:
                    idx = rng.choice(
                        len(frames), self.n_frames_per_sequence, replace=False
                    )
                    frames = [frames[i] for i in sorted(idx)]
                frame_annots.extend(frames)

        if self.sort_frames:
            frame_annots.sort(
                key=lambda f: (f["sequence_name"], f.get("frame_number", 0))
            )
        if self.limit_to > 0:
            frame_annots = frame_annots[: self.limit_to]
        self._frame_annots = frame_annots

    def __len__(self) -> int:
        return len(self._frame_annots)

    def sequence_names(self) -> List[str]:
        return sorted({f["sequence_name"] for f in self._frame_annots})

    def sequence_category(self, seq_name: str) -> str:
        return self._seq_annots.get(seq_name, {}).get("category", "default")

    def sequence_indices_in_order(self, seq_name: str):
        frames = [
            (f.get("frame_number", i), i)
            for i, f in enumerate(self._frame_annots)
            if f["sequence_name"] == seq_name
        ]
        for _, i in sorted(frames):
            yield i

    def seq_frame_index_to_dataset_index(
        self,
        seq_frame_index: Sequence[Sequence[Sequence]],
        allow_missing_indices: bool = False,
        remove_missing_indices: bool = False,
    ) -> List[List[Optional[int]]]:
        """Map batches of (sequence_name, frame_number[, path]) tuples to
        dataset indices (reference json_index_dataset.py:211)."""
        lookup = {
            (f["sequence_name"], int(f.get("frame_number", 0))): i
            for i, f in enumerate(self._frame_annots)
        }
        out: List[List[Optional[int]]] = []
        for batch in seq_frame_index:
            idxs: List[Optional[int]] = []
            for entry in batch:
                seq, fno = entry[0], int(entry[1])
                i = lookup.get((seq, fno))
                if i is None:
                    if not allow_missing_indices:
                        raise IndexError(
                            f"Missing frame ({seq}, {fno}) in the dataset."
                        )
                    if remove_missing_indices:
                        continue
                idxs.append(i)
            out.append(idxs)
        return out

    def subset_from_frame_index(
        self,
        frame_index: Sequence[Sequence],
        allow_missing_indices: bool = True,
    ) -> "JsonIndexDataset":
        """New dataset restricted to (sequence_name, frame_number[, path])
        entries, in the given order (reference json_index_dataset.py:264)."""
        import copy as _copy

        lookup = {
            (f["sequence_name"], int(f.get("frame_number", 0))): i
            for i, f in enumerate(self._frame_annots)
        }
        keep: List[int] = []
        for entry in frame_index:
            key = (entry[0], int(entry[1]))
            i = lookup.get(key)
            if i is None:
                if not allow_missing_indices:
                    raise IndexError(f"Missing frame {key} in the dataset.")
                continue
            keep.append(i)
        new = _copy.copy(self)
        new._frame_annots = [self._frame_annots[i] for i in keep]
        new._seq_annots = self._seq_annots
        new.eval_batches = None
        return new

    def get_eval_batches(self) -> Optional[List[List[int]]]:
        return self.eval_batches

    def get_all_train_cameras(self):
        """Batch of cameras of every frame with a viewpoint (reference
        json_index_dataset.py:293)."""
        import jax.numpy as _jnp

        Rs, Ts, fls, pps = [], [], [], []
        for f in self._frame_annots:
            vp = f.get("viewpoint", {})
            if not vp:
                continue
            Rs.append(vp["R"])
            Ts.append(vp["T"])
            fls.append(vp["focal_length"])
            pps.append(vp["principal_point"])
        if not Rs:
            return None
        return PerspectiveCameras.create(
            R=_jnp.asarray(Rs, _jnp.float32),
            T=_jnp.asarray(Ts, _jnp.float32),
            focal_length=_jnp.asarray(fls, _jnp.float32),
            principal_point=_jnp.asarray(pps, _jnp.float32),
        )

    def _resolve(self, path: str) -> str:
        return os.path.join(self.dataset_root, path) if self.dataset_root else path

    def _load_image(self, path: str) -> Optional[np.ndarray]:
        """(H, W, 3) float image at ORIGINAL resolution (the crop/resize
        pipeline in __getitem__ handles geometry, reference
        frame_data.py:791 FrameDataBuilder)."""
        if not self.load_images or not path:
            return None
        from PIL import Image

        p = self._resolve(path)
        if not os.path.isfile(p):
            warnings.warn(f"image not found: {p}")
            return None
        im = Image.open(p).convert("RGB")
        return np.asarray(im, np.float32) / 255.0

    def _load_mask(self, path: str) -> Optional[np.ndarray]:
        if not self.load_masks or not path:
            return None
        from PIL import Image

        p = self._resolve(path)
        if not os.path.isfile(p):
            return None
        im = Image.open(p).convert("L")
        return (np.asarray(im, np.float32) / 255.0)[..., None]

    def _load_depth(self, entry) -> Optional[np.ndarray]:
        if not self.load_depths:
            return None
        d = entry.get("depth", {})
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

    def frame_data_builder(self):
        """The FrameDataBuilder configured from this dataset's fields
        (reference frame_data.py:887; json_index_dataset delegates its
        blob/geometry pipeline to it)."""
        from .frame_data import FrameDataBuilder

        return FrameDataBuilder(
            dataset_root=self.dataset_root,
            load_images=self.load_images,
            load_depths=self.load_depths,
            load_depth_masks=self.load_depth_masks,
            load_masks=self.load_masks,
            image_height=self.image_height,
            image_width=self.image_width,
            box_crop=self.box_crop,
            box_crop_mask_thr=self.box_crop_mask_thr,
            box_crop_context=self.box_crop_context,
        )

    def __getitem__(self, index) -> FrameData:
        """Full FrameData build via FrameDataBuilder (reference
        frame_data.py:791 `FrameDataBuilder.build`)."""
        entry = self._frame_annots[index]
        fd = self.frame_data_builder().build(
            entry,
            sequence_category=self.sequence_category(entry["sequence_name"]),
        )
        meta = entry.get("meta")
        frame_type = (
            meta.get("frame_type", "known")
            if isinstance(meta, dict)
            else "known"
        )
        return dataclasses.replace(fd, frame_type=frame_type)
