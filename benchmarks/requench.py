"""Re-measure benchmark-grid rows that drifted vs a prior recording.

Timing the full grid while the host is loaded (e.g. a CPU test suite in
another process) inflates dispatch-bound rows. This tool re-times every
raster config whose fwd or fwd_bwd row moved more than --tol (default
15%) against the last committed BENCH_GRID.json, on a quiet host, and
rewrites BENCH_GRID_raster.json / BENCH_GRID.json in place with the
re-measured rows.

Usage: python -m benchmarks.requench [--tol 0.15]
"""

from __future__ import annotations

import json
import subprocess
import sys


def main(tol: float = 0.15):
    from . import bm_rasterize_meshes

    with open("BENCH_GRID.json") as f:
        cur = json.load(f)
    old_src = subprocess.run(
        ["git", "show", "HEAD:BENCH_GRID.json"],
        capture_output=True,
        text=True,
    ).stdout
    old = {r["name"]: r for r in json.loads(old_src)["rows"]}

    # group rows by config (strip _fwd / _fwd_bwd)
    def cfg_of(name):
        return name.replace("_fwd_bwd", "").replace("_fwd", "")

    drifted = set()
    for r in cur["rows"]:
        o = old.get(r["name"])
        if (
            o
            and r["name"].startswith("raster_")
            and abs(r["ms"] - o["ms"]) / max(o["ms"], 1e-9) > tol
        ):
            drifted.add(cfg_of(r["name"]))
    print(f"{len(drifted)} drifted configs: {sorted(drifted)}", flush=True)

    new_rows = {}
    for cfg in bm_rasterize_meshes.FULL_GRID:
        level, size, K, blur = cfg
        name = f"raster_ico{level}_{size}px_K{K}" + (
            "_blur" if blur > 0 else ""
        )
        if name not in drifted:
            continue
        for row in bm_rasterize_meshes.bench_config(*cfg):
            new_rows[row.name] = row

    from dataclasses import asdict

    def patch(path):
        # BENCH_GRID.json is {"rows": [...]}; BENCH_GRID_raster.json is a
        # bare top-level list (runner.write_rows) — handle both shapes and
        # write back the same shape.
        with open(path) as f:
            payload = json.load(f)
        rows = payload["rows"] if isinstance(payload, dict) else payload
        n = 0
        for i, r in enumerate(rows):
            if r["name"] in new_rows:
                rows[i] = asdict(new_rows[r["name"]])
                n += 1
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"patched {n} rows in {path}")
        return n

    patch("BENCH_GRID.json")
    patch("BENCH_GRID_raster.json")


if __name__ == "__main__":
    tol = 0.15
    if "--tol" in sys.argv:
        tol = float(sys.argv[sys.argv.index("--tol") + 1])
    main(tol)
