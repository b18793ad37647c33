"""Multi-host initialization and per-process data sharding.

The reference's multi-node story is torch.distributed / Accelerate env
bootstrapping (experiment.py:206-212, MASTER_ADDR/RANK).  JAX equivalent:
`jax.distributed.initialize` wires all hosts of a pod slice into one
runtime; each process then sees its local devices and participates in
global meshes.  Data loading is per-process: every host reads only its
slice of the global batch (`local_shard_indices`).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > TPU pod auto-detection
    (args all None on TPU hosts lets JAX use the TPU metadata service).
    No-op (returns False) in single-process runs without any of these.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    on_tpu_pod = jax.default_backend() == "tpu" and (
        "TPU_WORKER_HOSTNAMES" in os.environ
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if coordinator_address is None and not on_tpu_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        return False
    _INITIALIZED = True
    return True


def local_shard_indices(
    n_items: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[int]:
    """Indices of the global batch this process should load (contiguous
    block partition; the tail goes to the last process)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n_items // pc
    lo = pi * per
    hi = n_items if pi == pc - 1 else lo + per
    return list(range(lo, hi))


class PerProcessLoader:
    """Wrap an indexable dataset so each host iterates only its shard of
    every global batch (the DistributedSampler analog)."""

    def __init__(self, dataset, global_batch_size: int, shuffle_key=None):
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self._order = list(range(len(dataset)))
        if shuffle_key is not None:
            import numpy as np

            rng = np.random.RandomState(int(shuffle_key))
            rng.shuffle(self._order)

    def __iter__(self):
        n = len(self._order)
        for start in range(0, n - self.global_batch_size + 1,
                           self.global_batch_size):
            batch_ids = self._order[start : start + self.global_batch_size]
            local = local_shard_indices(len(batch_ids))
            yield [self.dataset[batch_ids[i]] for i in local]

    def __len__(self):
        return len(self._order) // self.global_batch_size
