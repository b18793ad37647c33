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
import enum
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


@dataclasses.dataclass
class DataLoaderMap:
    """train/val/test data loader triple (reference
    data_loader_map_provider.py:31)."""

    train: Optional[_Loader]
    val: Optional[_Loader]
    test: Optional[_Loader]

    def __getitem__(self, split: str):
        if split not in ("train", "val", "test"):
            raise ValueError(
                f"{split} was not a valid split name (train/val/test)"
            )
        return getattr(self, split)


class DataLoaderMapProviderBase(Configurable):
    """Provider of a collection of data loaders (reference :55)."""

    def get_data_loader_map(self, datasets) -> DataLoaderMap:
        raise NotImplementedError()


class BatchConditioningType(enum.Enum):
    """How conditioning frames are added to val/test batches
    (reference :233)."""

    SAME = "same"
    TRAIN = "train"
    KNOWN = "known"


class DoublePoolBatchSampler:
    """Random batches of one frame from `first_indices` plus
    (batch_size - 1) frames from `rest_indices` (reference :152)."""

    def __init__(
        self,
        first_indices: List[int],
        rest_indices: List[int],
        batch_size: int,
        replacement: bool,
        num_batches: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> None:
        self.first_indices = list(first_indices)
        self.rest_indices = list(rest_indices)
        self.batch_size = batch_size
        self.replacement = replacement
        self.num_batches = None if not num_batches else num_batches
        if batch_size - 1 > len(self.rest_indices):
            raise ValueError(
                f"Cannot make up ({batch_size})-batches from"
                f" {len(self.rest_indices)}"
            )
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        if self.num_batches is not None:
            return self.num_batches
        return len(self.first_indices)

    def __iter__(self) -> Iterator[List[int]]:
        n = len(self)
        if self.replacement:
            firsts = self._rng.randint(
                0, len(self.first_indices), size=n
            ).tolist()
        else:
            order = self._rng.permutation(len(self.first_indices))
            firsts = [int(order[i % len(order)]) for i in range(n)]
        for f in firsts:
            batch = [self.first_indices[f]]
            if self.batch_size > 1:
                rest = self._rng.choice(
                    len(self.rest_indices),
                    self.batch_size - 1,
                    replace=False,
                )
                batch += [self.rest_indices[int(r)] for r in rest]
            yield batch


@dataclasses.dataclass
class SimpleDataLoaderMapProvider(DataLoaderMapProviderBase):
    """Trivial provider: eval batches if the dataset defines them,
    otherwise shuffled single batches (reference :68)."""

    batch_size: int = 1
    num_workers: int = 0
    dataset_length_train: int = 0
    dataset_length_val: int = 0
    dataset_length_test: int = 0

    def get_data_loader_map(self, datasets) -> DataLoaderMap:
        return DataLoaderMap(
            train=self._make_data_loader(
                datasets["train"], self.dataset_length_train
            ),
            val=self._make_data_loader(
                datasets["val"], self.dataset_length_val
            ),
            test=self._make_data_loader(
                datasets["test"], self.dataset_length_test
            ),
        )

    def _make_data_loader(self, dataset, num_batches: int):
        if dataset is None:
            return None
        eval_batches = getattr(dataset, "get_eval_batches", lambda: None)()
        if eval_batches is not None:
            return _Loader(
                dataset, eval_batches, num_workers=self.num_workers
            )
        n = len(dataset)
        order = np.random.RandomState(0).permutation(n).tolist()
        if num_batches > 0:
            order = order[: num_batches * self.batch_size]
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        return _Loader(dataset, batches, num_workers=self.num_workers)
