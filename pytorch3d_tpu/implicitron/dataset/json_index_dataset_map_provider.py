"""The original (V1) CO3D dataset map provider.

Parity: reference implicitron/dataset/json_index_dataset_map_provider.py:68
(`JsonIndexDatasetMapProvider`): builds train/val/test JsonIndexDataset
views of one category with the CO3Dv1 layout
(`<root>/<category>/frame_annotations.jgz`, `set_lists/<name>.json` with
``{"train": [[seq, frame, path], ...], ...}``), single/multisequence
tasks, sequence restriction, and test_on_train.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

from ..tools.config import registry
from .dataset_base import DatasetMap, DatasetMapProviderBase
from .json_index_dataset import JsonIndexDataset


@registry.register
@dataclasses.dataclass
class JsonIndexDatasetMapProvider(DatasetMapProviderBase):
    """CO3Dv1 category provider (reference :68)."""

    category: str = ""
    task_str: str = "singlesequence"
    dataset_root: str = ""
    n_frames_per_sequence: int = -1
    test_on_train: bool = False
    restrict_sequence_name: Tuple[str, ...] = ()
    test_restrict_sequence_id: int = -1
    assert_single_seq: bool = False
    only_test_set: bool = False
    dataset_args: Optional[dict] = None

    def __post_init__(self):
        if self.only_test_set and self.test_on_train:
            raise ValueError("Cannot have only_test_set and test_on_train")

    def get_dataset_map(self) -> DatasetMap:
        cdir = os.path.join(self.dataset_root, self.category)
        frame_file = os.path.join(cdir, "frame_annotations.jgz")
        sequence_file = os.path.join(cdir, "sequence_annotations.jgz")
        set_list_name = (
            f"set_lists_{self.task_str}.json"
            if self.task_str != "singlesequence"
            or self.test_restrict_sequence_id < 0
            else f"set_lists_{self.task_str}_"
            f"{self.test_restrict_sequence_id}.json"
        )
        set_lists_file = os.path.join(cdir, "set_lists", set_list_name)
        if not os.path.isfile(set_lists_file):
            # CO3Dv1 also ships a single set_lists.json
            fallback = os.path.join(cdir, "set_lists.json")
            set_lists_file = (
                fallback if os.path.isfile(fallback) else set_lists_file
            )

        restrict = tuple(self.restrict_sequence_name)
        common = dict(
            frame_annotations_file=frame_file,
            sequence_annotations_file=(
                sequence_file if os.path.isfile(sequence_file) else ""
            ),
            dataset_root=self.dataset_root,
            pick_sequence=restrict,
            n_frames_per_sequence=self.n_frames_per_sequence,
            **(self.dataset_args or {}),
        )

        set_lists = {}
        if os.path.isfile(set_lists_file):
            with open(set_lists_file) as f:
                set_lists = json.load(f)

        def subset(split):
            ds = JsonIndexDataset(**common)
            entries = set_lists.get(split)
            if entries:
                allowed = {(seq, int(fn)) for seq, fn, *_ in entries}
                ds._frame_annots = [
                    fa
                    for fa in ds._frame_annots
                    if (fa["sequence_name"], int(fa.get("frame_number", 0)))
                    in allowed
                ]
            return ds

        train = None if self.only_test_set else subset("train")
        val = None if self.only_test_set else subset("val")
        test = train if self.test_on_train else subset("test")

        if self.assert_single_seq:
            for ds in (train, val, test):
                if ds is not None and len(set(ds.sequence_names())) > 1:
                    raise ValueError(
                        "assert_single_seq: dataset contains frames from "
                        "more than one sequence."
                    )
        return DatasetMap(train=train, val=val, test=test)
