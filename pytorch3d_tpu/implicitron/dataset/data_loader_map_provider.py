"""Batch samplers and data loaders.

Parity: reference implicitron/dataset/data_loader_map_provider.py
(`SequenceDataLoaderMapProvider` :253, `DoublePoolBatchSampler` :152) and
scene_batch_sampler.py:22 (`SceneBatchSampler`).

The torch DataLoader machinery becomes plain python iterators yielding
collated FrameData batches (host-side; device transfer happens when arrays
enter a jitted step).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..tools.config import Configurable
from .dataset_base import DatasetBase
from .frame_data import FrameData


@dataclasses.dataclass
class SceneBatchSampler(Configurable):
    """Sample batches of frames from the same sequence (reference :22)."""

    batch_size: int = 3
    num_batches: int = 100
    images_per_seq_options: Sequence[int] = (2,)
    sample_consecutive_frames: bool = False
    consecutive_frames_max_gap: int = 0
    seed: int = 0

    def sample_batches(self, dataset: DatasetBase) -> List[List[int]]:
        rng = np.random.RandomState(self.seed)
        seq_names = dataset.sequence_names()
        batches = []
        for _ in range(self.num_batches):
            seq = seq_names[rng.randint(len(seq_names))]
            idxs = list(dataset.sequence_indices_in_order(seq))
            n = min(self.batch_size, len(idxs))
            if self.sample_consecutive_frames and len(idxs) > n:
                start = rng.randint(len(idxs) - n + 1)
                chosen = idxs[start : start + n]
            else:
                chosen = [idxs[i] for i in rng.choice(len(idxs), n, replace=False)]
            batches.append(chosen)
        return batches


class _SingleSequenceListAdapter:
    """Adapts a plain list of frames (e.g. RenderedMeshDatasetMapProvider
    output) to the DatasetBase protocol as one sequence."""

    def __init__(self, frames):
        self._frames = frames

    def __len__(self):
        return len(self._frames)

    def __getitem__(self, i):
        return self._frames[i]

    def sequence_names(self):
        return ["scene"]

    def sequence_indices_in_order(self, seq_name):
        return iter(range(len(self._frames)))


class _Loader:
    """Batch loader with optional threaded prefetch.

    With ``num_workers > 0`` the next ``num_workers * prefetch_factor``
    batches are loaded+collated on a thread pool while the consumer
    (device step) runs — the TPU-native analog of the reference's
    torch DataLoader worker processes (frame loading is numpy/PIL/file
    IO which releases the GIL, so threads suffice and share memory with
    zero serialization cost).  Batch order is preserved."""

    def __init__(
        self,
        dataset: DatasetBase,
        batches: List[List[int]],
        num_workers: int = 0,
        prefetch_factor: int = 2,
    ):
        self._dataset = dataset
        self._batches = batches
        self._num_workers = num_workers
        self._prefetch = max(1, num_workers * prefetch_factor)

    def __len__(self) -> int:
        return len(self._batches)

    def _load(self, batch) -> FrameData:
        return FrameData.collate([self._dataset[i] for i in batch])

    def __iter__(self) -> Iterator[FrameData]:
        if self._num_workers <= 0:
            for batch in self._batches:
                yield self._load(batch)
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self._num_workers) as pool:
            pending = collections.deque()
            it = iter(self._batches)
            for batch in it:
                pending.append(pool.submit(self._load, batch))
                if len(pending) >= self._prefetch:
                    break
            while pending:
                fut = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(self._load, nxt))
                yield fut.result()


@dataclasses.dataclass
class SequenceDataLoaderMapProvider(Configurable):
    """Data loaders per split (reference :253)."""

    batch_size: int = 1
    num_workers: int = 0  # >0 enables threaded prefetch (see _Loader)
    dataset_length_train: int = 0
    dataset_length_val: int = 0
    train_num_batches: int = 100
    images_per_seq_options: Sequence[int] = (2,)

    def get_data_loader_map(self, datasets) -> dict:
        out = {}
        for split in ("train", "val", "test"):
            ds = datasets[split] if not hasattr(datasets, split) else getattr(datasets, split)
            if ds is None:
                out[split] = None
                continue
            if isinstance(ds, (list, tuple)):
                ds = _SingleSequenceListAdapter(ds)
            if split == "train":
                sampler = SceneBatchSampler(
                    batch_size=self.batch_size,
                    num_batches=self.train_num_batches,
                    images_per_seq_options=self.images_per_seq_options,
                )
                batches = sampler.sample_batches(ds)
            else:
                batches = [[i] for i in range(len(ds))]
            out[split] = _Loader(ds, batches, num_workers=self.num_workers)
        return out
