"""Dataset map provider over SQL-indexed datasets.

Parity: reference implicitron/dataset/sql_dataset_provider.py:46
(`SqlIndexDatasetMapProvider`): builds train/val/test `SqlIndexDataset`
views of one annotation database, selecting frames via a
`set_lists/<name>.json` file of the CO3Dv2 layout
(``{"train": [[seq, frame_number, path], ...], "val": ..., "test": ...}``),
with optional single-sequence restriction and test_on_train.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

from ..tools.config import registry
from .dataset_base import DatasetBase, DatasetMap, DatasetMapProviderBase
from .sql_dataset import SqlIndexDataset


class _SubsetDataset(DatasetBase):
    """A frame-index subset view of another dataset (the SQL analog of
    JsonIndexDataset.subset_from_frame_index)."""

    def __init__(self, base: DatasetBase, indices: List[int]) -> None:
        self._base = base
        self._indices = list(indices)

    def __len__(self) -> int:
        return len(self._indices)

    def __getitem__(self, i: int):
        return self._base[self._indices[int(i)]]

    def sequence_names(self) -> List[str]:
        names = []
        for i in self._indices:
            fd = None
            seq = self._base._annots[i].sequence_name  # noqa: SLF001
            if seq not in names:
                names.append(seq)
        return names

    def sequence_category(self, seq_name: str) -> str:
        return self._base.sequence_category(seq_name)

    def sequence_indices_in_order(self, seq_name: str):
        for j, i in enumerate(self._indices):
            if self._base._annots[i].sequence_name == seq_name:  # noqa: SLF001
                yield j


@registry.register
@dataclasses.dataclass
class SqlIndexDatasetMapProvider(DatasetMapProviderBase):
    """Train/val/test map over one SQL annotation db (reference :46)."""

    sqlite_metadata_file: str = ""
    dataset_root: str = ""
    subset_list_file: str = ""  # set_lists json; "" -> all frames in train
    pick_sequence: Tuple[str, ...] = ()
    exclude_sequence: Tuple[str, ...] = ()
    test_on_train: bool = False
    only_test_set: bool = False
    n_frames_per_sequence: int = -1
    dataset_args: Optional[Dict] = None

    def __post_init__(self):
        if self.only_test_set and self.test_on_train:
            raise ValueError(
                "Cannot have only_test_set and test_on_train"
            )

    def get_dataset_map(self) -> DatasetMap:
        dataset = SqlIndexDataset(
            sqlite_metadata_file=self.sqlite_metadata_file,
            dataset_root=self.dataset_root,
            pick_sequence=tuple(self.pick_sequence),
            exclude_sequence=tuple(self.exclude_sequence),
            n_frames_per_sequence=self.n_frames_per_sequence,
            **(self.dataset_args or {}),
        )
        if not self.subset_list_file:
            return DatasetMap(train=dataset, val=dataset, test=dataset)

        with open(self.subset_list_file) as f:
            set_lists = json.load(f)
        # (sequence_name, frame_number) -> dataset row index
        row_index = dataset._pair_index  # noqa: SLF001

        def subset(split: str) -> Optional[DatasetBase]:
            entries = set_lists.get(split)
            if entries is None:
                return None
            idx = [
                row_index[(e[0], int(e[1]))]
                for e in entries
                if (e[0], int(e[1])) in row_index
            ]
            return _SubsetDataset(dataset, idx)

        train = None if self.only_test_set else subset("train")
        val = None if self.only_test_set else subset("val")
        test = train if self.test_on_train else subset("test")
        return DatasetMap(train=train, val=val, test=test)
