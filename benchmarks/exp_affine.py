"""A/B experiment: tile-recentred affine edge functions (P3D_RASTER_AFFINE).

PERF_ANALYSIS.md headroom #1: the affine form cuts the per-pixel
barycentric cost from ~18 vector ops to 6 FMAs. The flag is read at
module import (rasterize_pallas._AFFINE), so the A/B runs each mode in a
fresh subprocess and compares:

  * select-kernel fwd time,
  * fused-fragments fwd and fwd+bwd time,
  * on-TPU parity of the affine mode vs the vertex-centered mode:
    per-pixel pix_to_face agreement fraction (computed from dumped
    arrays) and covered-pixel-count / mean-z deltas.

Writes (overwrites) the comparison to EXP_AFFINE.json. Run on a real TPU:
  python -m benchmarks.exp_affine
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CONFIGS = [
    # (ico level, image size, K, blur)
    (4, 512, 8, 1e-4),
    (5, 512, 8, 1e-4),
    (6, 1024, 8, 1e-5),
]


def _worker():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.exp_tile import setup
    from benchmarks.runner import time_fn
    from pytorch3d_tpu.renderer.mesh import rasterize_pallas as rp

    rows = []
    for level, size, K, blur in CONFIGS:
        fv, valid = setup(level, size, K, blur)
        tag = f"ico{level}_{size}px_K{K}"

        sel = jax.jit(
            lambda v, _valid=valid, _s=size, _b=blur, _k=K: rp.rasterize_topk_pallas(
                v, _valid, (_s, _s), _b, _k
            )
        )
        rows.append(
            {"name": f"select_{tag}", "ms": time_fn(lambda: sel(fv)) * 1e3}
        )

        frag = jax.jit(
            lambda v, _valid=valid, _s=size, _b=blur, _k=K: rp.rasterize_fragments_pallas(
                v, _valid, (_s, _s), _b, _k
            )
        )
        rows.append(
            {"name": f"emit_{tag}", "ms": time_fn(lambda: frag(fv)) * 1e3}
        )

        def loss(v, _valid=valid, _s=size, _b=blur, _k=K):
            out = rp.rasterize_fragments_pallas(v, _valid, (_s, _s), _b, _k)
            return (
                jnp.sum(jax.nn.sigmoid(-out[3] / _b)) * 1e-6
                + jnp.sum(out[1]) * 1e-6
            )

        g = jax.jit(jax.grad(loss))
        rows.append(
            {"name": f"fwdbwd_{tag}", "ms": time_fn(lambda: g(fv)) * 1e3}
        )

        # parity payload: dump pix_to_face so the parent can compute a
        # true per-pixel agreement fraction across modes
        idx, z = (np.asarray(x) for x in (frag(fv)[0], frag(fv)[1]))
        mode = os.environ.get("P3D_RASTER_AFFINE", "0")
        dump = f"/tmp/exp_affine_{tag}_mode{mode}.npy"
        np.save(dump, idx)
        rows.append(
            {
                "name": f"out_{tag}",
                "pix_sum": int((idx >= 0).sum()),
                "idx_dump": dump,
                "z_mean": float(np.where(idx >= 0, z, 0.0).mean()),
            }
        )
    print("WORKER_JSON:" + json.dumps(rows), flush=True)


def main():
    results = {}
    for mode in ("0", "1"):
        env = dict(os.environ, P3D_RASTER_AFFINE=mode)
        p = subprocess.run(
            [sys.executable, "-m", "benchmarks.exp_affine", "--worker"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3000,
        )
        line = [
            ln
            for ln in p.stdout.splitlines()
            if ln.startswith("WORKER_JSON:")
        ]
        if not line:
            print(p.stdout[-3000:])
            print(p.stderr[-3000:])
            raise RuntimeError(f"worker (affine={mode}) failed")
        results[mode] = json.loads(line[0][len("WORKER_JSON:"):])

    import numpy as np

    comparison = []
    base = {r["name"]: r for r in results["0"]}
    aff = {r["name"]: r for r in results["1"]}
    for name, b in base.items():
        a = aff.get(name)
        if a is None:
            print(f"warning: row {name} missing from affine run; skipped")
            continue
        if "ms" in b:
            comparison.append(
                {
                    "name": name,
                    "baseline_ms": round(b["ms"], 3),
                    "affine_ms": round(a["ms"], 3),
                    "speedup": round(b["ms"] / a["ms"], 3),
                }
            )
        else:
            idx_b = np.load(b["idx_dump"])
            idx_a = np.load(a["idx_dump"])
            agree = float((idx_b == idx_a).mean())
            covered = (idx_b >= 0) | (idx_a >= 0)
            agree_cov = float(
                (idx_b[covered] == idx_a[covered]).mean()
            ) if covered.any() else 1.0
            comparison.append(
                {
                    "name": name,
                    "pix_agreement": round(agree, 6),
                    "pix_agreement_covered": round(agree_cov, 6),
                    "pix_delta": a["pix_sum"] - b["pix_sum"],
                    "z_mean_delta": abs(a["z_mean"] - b["z_mean"]),
                }
            )
    for row in comparison:
        print(json.dumps(row))
    with open("EXP_AFFINE.json", "w") as f:
        json.dump(comparison, f, indent=1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker()
    else:
        main()
