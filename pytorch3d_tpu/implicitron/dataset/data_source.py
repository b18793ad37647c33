"""ImplicitronDataSource: datasets + dataloaders bundle.

Parity: reference implicitron/dataset/data_source.py:44.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from ..tools.config import ReplaceableBase, Configurable, registry, run_auto_creation
from .data_loader_map_provider import SequenceDataLoaderMapProvider
from .dataset_base import DatasetMap, ListDataset


class DataSourceBase(ReplaceableBase):
    """Replaceable base providing datasets + dataloaders (reference
    data_source.py:21)."""

    def get_datasets_and_dataloaders(self):
        raise NotImplementedError()


@dataclasses.dataclass
class ImplicitronDataSource(Configurable, DataSourceBase):
    """Encapsulates dataset map + data loader construction (reference :44)."""

    dataset_map_provider_class_type: str = "RenderedMeshDatasetMapProvider"
    dataset_map_provider_args: Dict[str, Any] = dataclasses.field(
        default_factory=dict
    )
    data_loader_map_provider_class_type: str = (
        "SequenceDataLoaderMapProvider"
    )
    data_loader_map_provider_args: Dict[str, Any] = dataclasses.field(
        default_factory=dict
    )

    def __post_init__(self):
        if self.dataset_map_provider_class_type == "RenderedMeshDatasetMapProvider":
            from .rendered_mesh_dataset_map_provider import (
                RenderedMeshDatasetMapProvider,
            )

            self._provider = RenderedMeshDatasetMapProvider(
                **self.dataset_map_provider_args
            )
        elif self.dataset_map_provider_class_type == "JsonIndexDatasetMapProvider":
            import json as _json

            from .json_index_dataset import JsonIndexDataset

            args = dict(self.dataset_map_provider_args)
            subset_lists_file = args.pop("subset_lists_file", "")
            subset_map = {}
            if subset_lists_file:
                with open(subset_lists_file) as f:
                    # {split: [(sequence_name, frame_number, path), ...]}
                    subset_map = _json.load(f)
            splits = {}
            for split in ("train", "val", "test"):
                ds = JsonIndexDataset(**args)
                if subset_map.get(split):
                    allowed = {
                        (seq, int(fn)) for seq, fn, *_ in subset_map[split]
                    }
                    ds._frame_annots = [
                        fa
                        for fa in ds._frame_annots
                        if (fa["sequence_name"], int(fa.get("frame_number", 0)))
                        in allowed
                    ]
                splits[split] = ds
            self._provider = None
            self._dataset_map = DatasetMap(**splits)
        elif (
            self.dataset_map_provider_class_type
            == "JsonIndexDatasetMapProviderV2"
        ):
            from .json_index_dataset_map_provider_v2 import (
                JsonIndexDatasetMapProviderV2,
            )

            self._provider = None
            self._dataset_map = JsonIndexDatasetMapProviderV2(
                **self.dataset_map_provider_args
            ).get_dataset_map()
        else:
            raise ValueError(
                f"Unknown provider {self.dataset_map_provider_class_type}"
            )
        if (
            self.data_loader_map_provider_class_type
            == "TrainEvalDataLoaderMapProvider"
        ):
            from .train_eval_data_loader_provider import (
                TrainEvalDataLoaderMapProvider,
            )

            self._loader_provider = TrainEvalDataLoaderMapProvider(
                **self.data_loader_map_provider_args
            )
        else:
            self._loader_provider = SequenceDataLoaderMapProvider(
                **self.data_loader_map_provider_args
            )

    def get_datasets_and_dataloaders(self) -> Tuple[DatasetMap, dict]:
        if self._provider is not None:
            dsmap_raw = self._provider.get_dataset_map()
            dsmap = DatasetMap(
                train=ListDataset(dsmap_raw["train"]),
                val=ListDataset(dsmap_raw["val"]),
                test=ListDataset(dsmap_raw["test"]),
            )
        else:
            dsmap = self._dataset_map
        loaders = self._loader_provider.get_data_loader_map(dsmap)
        return dsmap, loaders

    def all_train_cameras(self):
        return None
