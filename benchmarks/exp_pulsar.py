"""Pulsar at scale (VERDICT r2 #5): P = 1e4 / 1e5 / 1e6 spheres at 1024².

The reference's pulsar pitch is a fused CUDA sphere renderer at millions of
spheres up to 4K (reference docs/notes/renderer_getting_started.md:73,
settings: points_per_pixel=5, image_size=1024, radius=1e-2;
csrc/pulsar/gpu/renderer.*.gpu.cu).  This experiment measures OUR pulsar
(tile-binned chunk-streamed Pallas selection + softmax blend) at that
regime, forward and forward+gradients (wrt positions, colors, radii), and
the generic point-rasterizer pipeline (rasterize_points + AlphaCompositor
weights) at the same sizes for the reference's own pulsar-vs-pointraster
comparison.

Writes EXP_PULSAR.json (rows also summarized into BENCH_GRID.json by
requench if run).  Usage (real TPU, cwd=/root/repo):
    python -m benchmarks.exp_pulsar
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.runner import time_fn

SIZE = 1024
K = 5  # reference benchmark setting points_per_pixel=5
RADIUS_WORLD = 1e-2


def scene(P: int):
    """Random spheres in a frustum-filling box (reference bench style)."""
    rng = np.random.RandomState(42)
    pos = np.stack(
        [
            rng.uniform(-10, 10, P),
            rng.uniform(-10, 10, P),
            rng.uniform(20, 40, P),
        ],
        axis=-1,
    ).astype(np.float32)
    col = rng.rand(P, 3).astype(np.float32)
    rad = np.full((P,), 0.1, np.float32)  # ~1e-2 NDC after projection
    return jnp.asarray(pos), jnp.asarray(col), jnp.asarray(rad)


def bench_pulsar(P: int, rows: list) -> None:
    from pytorch3d_tpu.renderer.points.pulsar import Renderer

    pos, col, rad = scene(P)
    ren = Renderer(SIZE, SIZE, P, n_track=K)
    cam = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 2.0], jnp.float32)
    # host-side static binning sizes -> the jitted render uses the
    # sort-based binning instead of the O(n_tiles*P) top_k
    hints = ren.compute_binning_hints(pos, rad, cam, 45.0, min_depth=1.0)

    def fwd(pos, col, rad):
        return ren.forward(
            pos, col, rad, cam, 0.1, 45.0, min_depth=1.0,
            binning_hints=hints,
        )

    jfwd = jax.jit(fwd)
    img = jfwd(pos, col, rad)
    coverage = float(jnp.mean((img.sum(-1) < 2.9).astype(jnp.float32)))
    dt = time_fn(lambda: jfwd(pos, col, rad), warmup=2, iters=10)
    rows.append(
        {
            "name": f"pulsar_P{P}_{SIZE}px_K{K}_fwd",
            "ms": round(dt * 1e3, 3),
            "spheres_per_s": round(P / dt, 0),
            "coverage": round(coverage, 4),
        }
    )
    print(json.dumps(rows[-1]), flush=True)

    def loss(pos, col, rad):
        im = ren.forward(
            pos, col, rad, cam, 0.1, 45.0, min_depth=1.0,
            binning_hints=hints,
        )
        return jnp.sum(im * im) * 1e-6

    jgrad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    val, grads = jgrad(pos, col, rad)
    gmax = float(max(jnp.abs(g).max() for g in grads))
    assert np.isfinite(float(val)) and np.isfinite(gmax)
    dt = time_fn(lambda: jgrad(pos, col, rad), warmup=2, iters=10)
    rows.append(
        {
            "name": f"pulsar_P{P}_{SIZE}px_K{K}_fwd_bwd",
            "ms": round(dt * 1e3, 3),
            "spheres_per_s": round(P / dt, 0),
            "grad_max": gmax,
        }
    )
    print(json.dumps(rows[-1]), flush=True)


def bench_pointraster(P: int, rows: list) -> None:
    """The generic point pipeline at the same scene (pulsar's comparison
    baseline in the reference plot)."""
    from pytorch3d_tpu.renderer.points.rasterize_points_pallas import (
        rasterize_points_fragments_pallas,
        required_tiles_per_point,
    )

    pos, col, rad = scene(P)
    # project like pulsar does (perspective, sensor 2.0 / focal 5.0)
    inv_z = 1.0 / pos[:, 2]
    scale = 5.0 / 1.0
    pts_ndc = jnp.stack(
        [-pos[:, 0] * inv_z * scale, pos[:, 1] * inv_z * scale, pos[:, 2]],
        axis=-1,
    )
    r_ndc = rad * inv_z * scale
    valid = (pos[:, 2] > 1.0) & (pos[:, 2] < 45.0)
    t = required_tiles_per_point(pts_ndc, r_ndc, valid, (SIZE, SIZE))
    mtpp = (max(int(t[0]), 1), max(int(t[1]), 1))

    def fwd_composite(pts, cols):
        idx, zbuf, dists = rasterize_points_fragments_pallas(
            pts, r_ndc, valid, (SIZE, SIZE), K, None, mtpp
        )
        w = jnp.clip(1.0 - dists / jnp.clip(r_ndc[jnp.maximum(idx, 0)]
                                            ** 2, 1e-12), 0.0, 1.0)
        w = jnp.where(idx >= 0, w, 0.0)
        c = cols[jnp.maximum(idx, 0)]
        denom = jnp.clip(w.sum(-1, keepdims=True), 1e-8)
        return jnp.sum(w[..., None] * c, axis=-2) / denom

    jf = jax.jit(fwd_composite)
    jf(pts_ndc, col)
    dt = time_fn(lambda: jf(pts_ndc, col), warmup=2, iters=10)
    rows.append(
        {
            "name": f"pointraster_P{P}_{SIZE}px_K{K}_fwd",
            "ms": round(dt * 1e3, 3),
            "spheres_per_s": round(P / dt, 0),
        }
    )
    print(json.dumps(rows[-1]), flush=True)


def main() -> None:
    global SIZE
    rows = []
    for P in (10_000, 100_000, 1_000_000):
        bench_pulsar(P, rows)
        bench_pointraster(P, rows)
    # the reference's claimed operating envelope: millions of spheres
    # "up to 4K" (reference docs/notes/renderer_getting_started.md:73)
    base = SIZE
    try:
        for size in (2048, 3840):
            SIZE = size
            bench_pulsar(1_000_000, rows)
    finally:
        SIZE = base
    with open("EXP_PULSAR.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote EXP_PULSAR.json")


if __name__ == "__main__":
    main()
