"""Loader provider honoring the test dataset's internal eval batches.

Parity: reference implicitron/dataset/train_eval_data_loader_provider.py
(`TrainEvalDataLoaderMapProvider` :28): train/val loaders use the scene
batch sampler; the test loader iterates `dataset.get_eval_batches()`
([target, known source views...] index lists) when present, falling back
to the generic path otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

from ..tools.config import Configurable, registry
from .data_loader_map_provider import (
    SceneBatchSampler,
    SequenceDataLoaderMapProvider,
    _Loader,
    _SingleSequenceListAdapter,
)


@dataclasses.dataclass
class TrainEvalDataLoaderMapProvider(SequenceDataLoaderMapProvider):
    """SequenceDataLoaderMapProvider + eval-batch test loader
    (reference :28)."""

    dataset_length_test: int = 0

    def get_data_loader_map(self, datasets) -> dict:
        out = super().get_data_loader_map(datasets)
        test = (
            getattr(datasets, "test", None)
            if hasattr(datasets, "test")
            else datasets.get("test")
        )
        if test is not None and not isinstance(test, (list, tuple)):
            eval_batches = getattr(test, "get_eval_batches", lambda: None)()
            if eval_batches is not None:
                out["test"] = _Loader(test, eval_batches)
        return out
