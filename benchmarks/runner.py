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
    roofline_frac: Optional[float] = None  # roofline_ms / ms (probe-based
    # lower-bound denominator; can exceed 1 — kept for comparability with
    # earlier rounds)
    roofline_frac_cal: Optional[float] = None  # frac against the
    # CALIBRATED ceiling (roofline.demonstrated_vpu_issue_ops; <= 1)
    extra: Dict[str, Any] = field(default_factory=dict)

    def line(self) -> str:
        s = f"{self.name:48s} {self.ms:9.3f} ms"
        if self.unit_rate is not None:
            s += f"  {self.unit_rate:10.2f} {self.unit}"
        if self.roofline_frac_cal is not None:
            s += f"  roofline {100 * self.roofline_frac_cal:5.1f}%cal"
        elif self.roofline_frac is not None:
            s += f"  roofline {100 * self.roofline_frac:5.1f}%"
        return s


def _force(out) -> None:
    """Drain the device queue: fetch ONE element of ONE output leaf.

    `jax.block_until_ready` can return before remote execution finishes
    under the axon TPU tunnel (measured: a 115 ms kernel reported as
    0.13 ms), so a real device_get is required.  But each device_get
    costs one tunnel RTT (~35 ms measured) — fetching *every* leaf
    inflated measurements by leaves*RTT/iters (a full train step returns
    ~185 param/opt-state leaves -> ~650 ms of phantom time).  Executions
    are enqueued in-order on the single device stream, so one element of
    the last output is ready only after all prior work completed; one
    fetch drains everything."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
            return


def time_fn(
    fn: Callable[[], Any],
    warmup: int = 2,
    iters: int = 10,
    trace_dir: Optional[str] = None,
) -> float:
    """Mean seconds per call after warmup (compile excluded).

    The final sync materializes one output element (see _force) so the
    measurement is valid under asynchronous/remote runtimes; the cost of
    that sync on already-ready buffers (one tunnel RTT) is measured
    immediately afterwards and subtracted.  For sub-millisecond kernels a
    single RTT (~35 ms, jittery) swamps `iters` calls, so the iteration
    count is grown adaptively until device time dominates the sync cost."""
    for _ in range(warmup):
        out = fn()
    _force(out)
    ctx = (
        jax.profiler.trace(trace_dir)
        if trace_dir
        else contextlib.nullcontext()
    )

    def measure(n: int):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _force(out)
        t1 = time.perf_counter()
        # Pure fetch overhead on buffers that are already on-device and
        # ready (one RTT); subtracting leaves dispatch + device compute.
        t2 = time.perf_counter()
        _force(out)
        t3 = time.perf_counter()
        return (t1 - t0), (t3 - t2)

    max_iters = 2000
    with ctx:
        n = iters
        while True:
            total, fetch = measure(n)
            compute = total - fetch
            if compute >= 5.0 * fetch or n >= max_iters:
                return max(compute / n, 1e-9)
            # grow so the next pass's device time is ~10 RTTs
            grow = int(n * 10.0 * fetch / max(compute, 1e-6 * fetch))
            n = min(max_iters, max(4 * n, grow))


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
