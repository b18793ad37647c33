"""Single-scene datasets (one sequence of posed images).

Parity: reference implicitron/dataset/single_sequence_dataset.py
(`SingleSceneDataset` :33, `SingleSceneDatasetMapProviderBase` :86): an
in-memory dataset over one scene's images/poses with train/val/test index
splits, per-split frame types, eval batches of [target, known...] frames,
and optional extension of test batches with known training frames.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..tools.config import Configurable, registry
from .dataset_base import DatasetBase, DatasetMap, DatasetMapProviderBase
from .frame_data import FrameData

DATASET_TYPE_KNOWN = "train_known"
DATASET_TYPE_UNKNOWN = "test_unseen"

_SINGLE_SEQUENCE_NAME: str = "one_sequence"


@dataclasses.dataclass
class SingleSceneDataset(DatasetBase):
    """A dataset of images from a single scene (reference :33)."""

    images: List  # list of (H, W, 3) arrays
    fg_probabilities: Optional[List]  # list of (H, W, 1) or None
    poses: List  # list of length-1 camera objects
    object_name: str
    frame_types: List[str]
    eval_batches: Optional[List[List[int]]] = None

    def sequence_names(self) -> List[str]:
        return [_SINGLE_SEQUENCE_NAME]

    def __len__(self) -> int:
        return len(self.poses)

    def sequence_indices_in_order(self, seq_name: str) -> Iterator[int]:
        return iter(range(len(self)))

    def sequence_frames_in_order(
        self, seq_name: str, subset_filter: Optional[Sequence[str]] = None
    ) -> Iterator[Tuple[float, int, int]]:
        for i in range(len(self)):
            if subset_filter is None or self.frame_types[i] in subset_filter:
                yield 0.0, i, i

    def __getitem__(self, index) -> FrameData:
        if index >= len(self):
            raise IndexError(f"index {index} out of range {len(self)}")
        image = self.images[index]
        fg = (
            None
            if self.fg_probabilities is None
            else self.fg_probabilities[index]
        )
        return FrameData(
            frame_number=index,
            sequence_name=_SINGLE_SEQUENCE_NAME,
            sequence_category=self.object_name,
            camera=self.poses[index],
            image_rgb=image[None] if image.ndim == 3 else image,
            fg_probability=(
                None if fg is None else (fg[None] if fg.ndim == 3 else fg)
            ),
            frame_type=self.frame_types[index],
        )

    def get_eval_batches(self) -> Optional[List[List[int]]]:
        return self.eval_batches


@dataclasses.dataclass
class SingleSceneDatasetMapProviderBase(DatasetMapProviderBase):
    """Base provider for one-scene data (reference :86).  Subclasses set
    self.poses / self.images / self.fg_probabilities / self.i_split in
    `_load_data`."""

    base_dir: str = ""
    object_name: str = ""
    n_known_frames_for_test: Optional[int] = None

    def __post_init__(self) -> None:
        self._load_data()

    def _load_data(self) -> None:
        # must set: poses (len-1 cameras), images, fg_probabilities,
        # i_split (train/val/test index lists)
        raise NotImplementedError()

    def _get_dataset(
        self, split_idx: int, frame_type: str, set_eval_batches: bool = False
    ) -> SingleSceneDataset:
        split = list(self.i_split[split_idx])
        frame_types = [frame_type] * len(split)
        fg = (
            None
            if self.fg_probabilities is None
            else [self.fg_probabilities[i] for i in split]
        )
        eval_batches = [[i] for i in range(len(split))]
        if split_idx != 0 and self.n_known_frames_for_test is not None:
            train_split = list(self.i_split[0])
            if set_eval_batches:
                generator = np.random.default_rng(seed=0)
                for batch in eval_batches:
                    to_add = generator.permutation(len(train_split))[
                        : self.n_known_frames_for_test
                    ]
                    batch.extend((to_add + len(split)).tolist())
            split = split + train_split
            frame_types.extend([DATASET_TYPE_KNOWN] * len(train_split))
            if fg is not None:
                fg = fg + [
                    self.fg_probabilities[i] for i in train_split
                ]

        return SingleSceneDataset(
            object_name=self.object_name,
            images=[self.images[i] for i in split],
            fg_probabilities=fg,
            poses=[self.poses[i] for i in split],
            frame_types=frame_types,
            eval_batches=eval_batches if set_eval_batches else None,
        )

    def get_dataset_map(self) -> DatasetMap:
        return DatasetMap(
            train=self._get_dataset(0, DATASET_TYPE_KNOWN),
            val=self._get_dataset(1, DATASET_TYPE_UNKNOWN),
            test=self._get_dataset(2, DATASET_TYPE_UNKNOWN, True),
        )

    def get_all_train_cameras(self):
        from ...renderer.camera_utils import join_cameras_as_batch

        cameras = [self.poses[i] for i in self.i_split[0]]
        return join_cameras_as_batch(cameras)
