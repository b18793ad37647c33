"""CO3Dv2-layout dataset map provider.

Parity: reference implicitron/dataset/json_index_dataset_map_provider_v2.py
(`JsonIndexDatasetMapProviderV2` :57): per-category folders with gzipped
frame/sequence annotations, `set_lists/set_lists_<subset>.json` frame
subsets, `eval_batches/eval_batches_<subset>.json` evaluation batches,
multi-category joins, test_on_train / only_test_set modes, and
n_known_frames_for_test extension of eval batches with train views.
"""

from __future__ import annotations

import copy
import dataclasses
import json
import os
import warnings
from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..tools.config import registry
from .dataset_base import DatasetMap, DatasetMapProviderBase
from .json_index_dataset import JsonIndexDataset

_CO3DV2_DATASET_ROOT: str = os.getenv("CO3DV2_DATASET_ROOT", "")


def get_available_subset_names(
    dataset_root: str, category: str
) -> List[str]:
    """Subset names with a set_lists json in `<root>/<category>/set_lists`
    (reference :460)."""
    category_dir = os.path.join(dataset_root, category)
    if not os.path.isdir(category_dir):
        raise ValueError(
            f"Looking for dataset files in {category_dir}. "
            "Please specify a correct dataset_root folder."
        )
    set_list_dir = os.path.join(category_dir, "set_lists")
    if not os.path.isdir(set_list_dir):
        return []
    return [
        f.replace("set_lists_", "").replace(".json", "")
        for f in os.listdir(set_list_dir)
    ]


@registry.register
@dataclasses.dataclass
class JsonIndexDatasetMapProviderV2(DatasetMapProviderBase):
    """CO3Dv2 provider (reference :57).  `category` may be a single name
    or a comma-separated list (multi-category maps are concatenated)."""

    category: str = ""
    subset_name: str = ""
    dataset_root: str = _CO3DV2_DATASET_ROOT
    test_on_train: bool = False
    only_test_set: bool = False
    load_eval_batches: bool = True
    n_known_frames_for_test: int = 0
    dataset_args: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if self.only_test_set and self.test_on_train:
            raise ValueError("Cannot have only_test_set and test_on_train")
        categories = [c.strip() for c in self.category.split(",") if c.strip()]
        if not categories:
            raise ValueError("category must be specified")
        maps = [self._load_category(c) for c in categories]
        if len(maps) == 1:
            self.dataset_map = maps[0]
        else:
            self.dataset_map = self._join_maps(maps)

    # ------------------------------------------------------------------ #

    def _load_annotation_json(self, json_filename: str):
        full_path = os.path.join(self.dataset_root, json_filename)
        if not os.path.isfile(full_path):
            raise ValueError(
                f"Looking for dataset json file in {full_path}. "
                "Please specify a correct dataset_root folder."
            )
        with open(full_path) as f:
            return json.load(f)

    def get_category_to_subset_name_list(self) -> Dict[str, List[str]]:
        """Global `category_to_subset_name_list.json` index
        (reference :366)."""
        return self._load_annotation_json("category_to_subset_name_list.json")

    def _load_category(self, category: str) -> DatasetMap:
        frame_file = os.path.join(
            self.dataset_root, category, "frame_annotations.jgz"
        )
        sequence_file = os.path.join(
            self.dataset_root, category, "sequence_annotations.jgz"
        )
        if not os.path.isfile(frame_file):
            raise ValueError(
                f"Looking for frame annotations in {frame_file}."
                " Please specify a correct dataset_root folder."
                " Note: By default the root folder is taken from the"
                " CO3DV2_DATASET_ROOT environment variable."
            )

        dataset = JsonIndexDataset(
            **{
                **self.dataset_args,
                "dataset_root": self.dataset_root,
                "frame_annotations_file": frame_file,
                "sequence_annotations_file": sequence_file,
                "subset_lists_file": "",
                "subsets": None,
            }
        )

        available = get_available_subset_names(self.dataset_root, category)
        if self.subset_name not in available:
            raise ValueError(
                f"Unknown subset name {self.subset_name}."
                f" Choose one of available subsets: {available}."
            )

        subset_mapping = self._load_annotation_json(
            os.path.join(
                category, "set_lists", f"set_lists_{self.subset_name}.json"
            )
        )
        eval_batch_index = None
        if self.load_eval_batches:
            eval_batch_index = self._load_annotation_json(
                os.path.join(
                    category,
                    "eval_batches",
                    f"eval_batches_{self.subset_name}.json",
                )
            )

        train_dataset = None
        if not self.only_test_set:
            train_dataset = dataset.subset_from_frame_index(
                subset_mapping["train"]
            )

        if self.test_on_train:
            assert train_dataset is not None
            val_dataset = test_dataset = train_dataset
        else:
            val_dataset = dataset.subset_from_frame_index(
                subset_mapping["val"]
            )
            if self.n_known_frames_for_test > 0 and self.load_eval_batches:
                (
                    eval_batch_index,
                    subset_mapping["test"],
                ) = self._extend_test_data_with_known_views(
                    subset_mapping, eval_batch_index
                )
            test_dataset = dataset.subset_from_frame_index(
                subset_mapping["test"]
            )
            if self.load_eval_batches:
                try:
                    test_dataset.eval_batches = (
                        test_dataset.seq_frame_index_to_dataset_index(
                            eval_batch_index
                        )
                    )
                except IndexError:
                    warnings.warn(
                        "Some eval batches are missing from the test"
                        " dataset; evaluation results will be incomparable"
                        " to the original dataset."
                    )
                    test_dataset.eval_batches = (
                        test_dataset.seq_frame_index_to_dataset_index(
                            eval_batch_index,
                            allow_missing_indices=True,
                            remove_missing_indices=True,
                        )
                    )

        return DatasetMap(
            train=train_dataset, val=val_dataset, test=test_dataset
        )

    def _extend_test_data_with_known_views(
        self, subset_mapping, eval_batch_index
    ):
        """Append n known train frames per eval batch (reference :424)."""
        sequence_to_train_frames = defaultdict(list)
        for frame_entry in subset_mapping["train"]:
            sequence_to_train_frames[frame_entry[0]].append(frame_entry)
        test_set = {tuple(s) for s in subset_mapping["test"]}

        out = copy.deepcopy(eval_batch_index)
        generator = np.random.default_rng(seed=0)
        for batch in out:
            seq = batch[0][0]
            known = sequence_to_train_frames[seq]
            idx = generator.permutation(len(known))[
                : self.n_known_frames_for_test
            ]
            entries = [known[a] for a in idx]
            batch.extend(entries)
            test_set.update(tuple(e) for e in entries)
        return out, [list(e) for e in test_set]

    def _join_maps(self, maps: Sequence[DatasetMap]) -> DatasetMap:
        def join(split: str):
            parts = [m[split] for m in maps if m[split] is not None]
            if not parts:
                return None
            base = copy.copy(parts[0])
            base._frame_annots = [
                f for p in parts for f in p._frame_annots
            ]
            base._seq_annots = {
                k: v for p in parts for k, v in p._seq_annots.items()
            }
            ebs = [p.eval_batches for p in parts]
            if all(e is not None for e in ebs):
                out, off = [], 0
                for p in parts:
                    out.extend(
                        [[i + off for i in b] for b in p.eval_batches]
                    )
                    off += len(p._frame_annots)
                base.eval_batches = out
            else:
                base.eval_batches = None
            return base

        return DatasetMap(
            train=join("train"), val=join("val"), test=join("test")
        )

    def get_dataset_map(self) -> DatasetMap:
        return self.dataset_map

    def get_all_train_cameras(self):
        train = self.dataset_map.train
        return None if train is None else train.get_all_train_cameras()
