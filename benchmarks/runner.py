"""Timing harness for the benchmark grid.

Equivalent of the reference's fvcore wrapper (tests/benchmarks/bm_main.py:15
runs each bm_*.py in a subprocess; benchmark() does warmup+timed loops) —
here a plain function-level timer plus optional `jax.profiler` traces
(SURVEY §5 asked for in-library tracing, which the reference lacks).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax


@dataclass
class BenchRow:
    name: str
    ms: float
    unit_rate: Optional[float] = None  # e.g. Mpix/s, Mrays/s
    unit: Optional[str] = None
    roofline_ms: Optional[float] = None  # model-ideal time
    roofline_frac: Optional[float] = None  # roofline_ms / ms
    extra: Dict[str, Any] = field(default_factory=dict)

    def line(self) -> str:
        s = f"{self.name:48s} {self.ms:9.3f} ms"
        if self.unit_rate is not None:
            s += f"  {self.unit_rate:10.2f} {self.unit}"
        if self.roofline_frac is not None:
            s += f"  roofline {100 * self.roofline_frac:5.1f}%"
        return s


def _force(out) -> None:
    """Force completion of every output buffer.

    `jax.block_until_ready` can return before remote execution finishes
    under the axon TPU tunnel (measured: a 115 ms kernel reported as
    0.13 ms); materializing one element per leaf costs one RTT and
    guarantees the device queue is drained."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def time_fn(
    fn: Callable[[], Any],
    warmup: int = 2,
    iters: int = 10,
    trace_dir: Optional[str] = None,
) -> float:
    """Mean seconds per call after warmup (compile excluded).  The final
    sync materializes output elements (see _force) so the measurement is
    valid under asynchronous/remote runtimes; the single RTT is
    amortized over `iters`."""
    for _ in range(warmup):
        out = fn()
    _force(out)
    ctx = (
        jax.profiler.trace(trace_dir)
        if trace_dir
        else contextlib.nullcontext()
    )
    with ctx:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _force(out)
        dt = (time.perf_counter() - t0) / iters
    return dt


def trace_dir_for(name: str) -> Optional[str]:
    """Profiler trace destination if BENCH_TRACE=1 (written under
    ./profile_traces/<name>, viewable with tensorboard/xprof)."""
    if os.environ.get("BENCH_TRACE", "0") != "1":
        return None
    d = os.path.join("profile_traces", name)
    os.makedirs(d, exist_ok=True)
    return d


def write_rows(rows: List[BenchRow], path: str) -> None:
    with open(path, "w") as f:
        json.dump([asdict(r) for r in rows], f, indent=1)
    print(f"wrote {len(rows)} rows -> {path}")
