"""Mesh-rasterization benchmark grid with roofline accounting.

Mirrors the reference grid (/root/reference/tests/benchmarks/
bm_rasterize_meshes.py:43-60: ico levels 0-6, image 64/128/512, K 3/50)
extended to 1024 px (the pulsar "4K-capable" axis) and annotated with the
fine-kernel roofline fraction (BASELINE.json >=70% target) — the reference
publishes no numbers for this grid, so ours are the record.

Run: python -m benchmarks.bm_rasterize_meshes [--full]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from .roofline import (
    calibration_scale,
    fine_kernel_roofline_s,
    grad_kernel_roofline_s,
    raster_candidates,
)
from .runner import BenchRow, time_fn, trace_dir_for, write_rows

# (ico_level, image_size, faces_per_pixel, blur)
QUICK_GRID = [
    (2, 128, 3, 0.0),
    (4, 512, 8, 1e-4),
    (5, 512, 8, 1e-4),
    (6, 1024, 8, 1e-5),
]
FULL_GRID = [
    (lvl, s, k, blur)
    for lvl in (0, 2, 4, 5, 6)
    for s in (64, 128, 512, 1024)
    for k, blur in ((3, 0.0), (8, 1e-4), (50, 1e-4))
    # reference caps K=50 runs at small images; we skip only the absurd ones
    if not (k == 50 and s > 512) and not (lvl == 6 and s < 512)
]


def _setup(level: int, image_size: int, K: int, blur: float):
    from pytorch3d_tpu.renderer import (
        FoVPerspectiveCameras,
        MeshRasterizer,
        RasterizationSettings,
        look_at_view_transform,
    )
    from pytorch3d_tpu.utils import ico_sphere

    mesh = ico_sphere(level)
    R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=30.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    rast = MeshRasterizer(
        cams,
        RasterizationSettings(
            image_size=image_size, blur_radius=blur, faces_per_pixel=K
        ),
    )
    mesh_ndc = rast.transform(mesh)
    return mesh_ndc


def bench_config(level: int, image_size: int, K: int, blur: float):
    from pytorch3d_tpu.renderer.mesh.rasterize_meshes import rasterize_meshes

    mesh_ndc = _setup(level, image_size, K, blur)
    verts = mesh_ndc.verts_padded()
    fv = verts[0][mesh_ndc.faces_padded()[0]]
    valid = jnp.ones((fv.shape[0],), bool)
    name = f"raster_ico{level}_{image_size}px_K{K}" + (
        "_blur" if blur > 0 else ""
    )

    fwd = jax.jit(
        lambda v: rasterize_meshes(
            mesh_ndc.update_padded(v),
            image_size=image_size,
            blur_radius=blur,
            faces_per_pixel=K,
        )
    )

    def loss(v):
        pix, zbuf, bary, dists = rasterize_meshes(
            mesh_ndc.update_padded(v),
            image_size=image_size,
            blur_radius=blur,
            faces_per_pixel=K,
        )
        sil = jax.nn.sigmoid(-dists / 1e-4)
        return jnp.sum(sil) * 1e-6 + jnp.sum(zbuf) * 1e-6

    fwdbwd = jax.jit(jax.grad(loss))

    ideal_s = fine_kernel_roofline_s(fv, valid, (image_size,) * 2, blur, K)
    # backward ideal from the grad kernel's own analytic op count (same
    # candidate walk, ~1.6-1.9x the forward's ops; replaces the old
    # "2x the fine pass" convention — see grad_kernel_flops_per_candidate)
    ideal_bwd_s = grad_kernel_roofline_s(fv, valid, (image_size,) * 2, blur, K)
    cand = raster_candidates(fv, valid, (image_size,) * 2, blur, K)

    rows = []
    for tag, fn in (("fwd", fwd), ("fwd_bwd", fwdbwd)):
        dt = time_fn(
            lambda fn=fn: fn(verts), trace_dir=trace_dir_for(f"{name}_{tag}")
        )
        ideal = ideal_s if tag == "fwd" else ideal_s + ideal_bwd_s
        rows.append(
            BenchRow(
                name=f"{name}_{tag}",
                ms=dt * 1e3,
                unit_rate=image_size * image_size / dt / 1e6,
                unit="Mpix/s",
                roofline_ms=ideal * 1e3,
                roofline_frac=ideal / dt,
                roofline_frac_cal=ideal / dt * calibration_scale(),
                extra={
                    "faces": int(fv.shape[0]),
                    "candidates": cand,
                },
            )
        )
        print(rows[-1].line(), flush=True)
    return rows


def main(full: bool = False, out: str = "BENCH_GRID_raster.json"):
    grid = FULL_GRID if full else QUICK_GRID
    rows = []
    for cfg in grid:
        rows.extend(bench_config(*cfg))
    write_rows(rows, out)
    return rows


if __name__ == "__main__":
    main(full="--full" in sys.argv)
