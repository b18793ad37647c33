"""Dataset base types.

Parity: reference implicitron/dataset/dataset_base.py:29 (`DatasetBase`),
dataset_map_provider.py (`DatasetMap`, `DatasetMapProviderBase`).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

from ..tools.config import ReplaceableBase
from .frame_data import FrameData


class DatasetBase(ReplaceableBase):
    """A dataset of FrameData (reference dataset_base.py:29)."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, index) -> FrameData:
        raise NotImplementedError

    def get_frame_numbers_and_timestamps(
        self, idxs: Sequence[int], subset_filter=None
    ):
        raise ValueError("This dataset does not contain videos.")

    def sequence_names(self) -> List[str]:
        """All sequence names present."""
        raise NotImplementedError

    def sequence_indices_in_order(self, seq_name: str) -> Iterator[int]:
        raise NotImplementedError

    def category_to_sequence_names(self):
        out = {}
        for seq in self.sequence_names():
            out.setdefault(self.sequence_category(seq), []).append(seq)
        return out

    def sequence_category(self, seq_name: str) -> str:
        return "default"


@dataclasses.dataclass
class DatasetMap:
    """train/val/test dataset triple (reference dataset_map_provider.py)."""

    train: Optional[DatasetBase]
    val: Optional[DatasetBase]
    test: Optional[DatasetBase]

    def __getitem__(self, split: str):
        return getattr(self, split)

    def iter_datasets(self):
        for ds in (self.train, self.val, self.test):
            if ds is not None:
                yield ds


class DatasetMapProviderBase(ReplaceableBase):
    def get_dataset_map(self) -> DatasetMap:
        raise NotImplementedError

    def get_all_train_cameras(self):
        return None


class ListDataset(DatasetBase):
    """A trivial in-memory FrameData list dataset."""

    def __init__(self, frames: List[FrameData]) -> None:
        self._frames = frames

    def __len__(self) -> int:
        return len(self._frames)

    def __getitem__(self, index) -> FrameData:
        return self._frames[index]

    def sequence_names(self) -> List[str]:
        return sorted(
            {str(f.sequence_name) for f in self._frames}
        )

    def sequence_indices_in_order(self, seq_name: str):
        for i, f in enumerate(self._frames):
            if str(f.sequence_name) == seq_name:
                yield i
