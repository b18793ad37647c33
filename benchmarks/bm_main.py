"""Run the full benchmark suite -> BENCH_GRID.json.

TPU analog of the reference runner (tests/benchmarks/bm_main.py:15) with
what the reference lacks (SURVEY §5): measured-peak roofline accounting and
optional jax.profiler traces (BENCH_TRACE=1).

Usage: python -m benchmarks.bm_main [--full]
"""

from __future__ import annotations

import json
import sys

import jax


def main(full: bool = False):
    from . import bm_points_knn_nerf, bm_rasterize_meshes
    from .roofline import (
        measured_hbm_bandwidth,
        measured_vpu_issue_ops,
        measured_vpu_peak_flops,
    )

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    vpu = measured_vpu_peak_flops()
    ops = measured_vpu_issue_ops()
    hbm = measured_hbm_bandwidth()
    print(
        f"measured VPU fp32 FMA peak: {vpu / 1e12:.2f} TFLOP/s, "
        f"mixed-op issue: {ops / 1e12:.2f} Tops/s, "
        f"HBM: {hbm / 1e9:.0f} GB/s",
        flush=True,
    )

    rows = []
    rows += bm_rasterize_meshes.main(full=full, out="BENCH_GRID_raster.json")
    rows += bm_points_knn_nerf.main(out="BENCH_GRID_ops.json")

    from dataclasses import asdict

    payload = {
        "device": jax.devices()[0].device_kind,
        "measured_vpu_fp32_tflops": vpu / 1e12,
        "measured_vpu_issue_tops": ops / 1e12,
        "measured_hbm_gbps": hbm / 1e9,
        "rows": [asdict(r) for r in rows],
    }
    with open("BENCH_GRID.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote BENCH_GRID.json ({len(rows)} rows)")


if __name__ == "__main__":
    main(full="--full" in sys.argv)
