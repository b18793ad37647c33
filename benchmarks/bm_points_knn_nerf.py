"""Point-rasterization, KNN, and NeRF-step benchmark rows.

Counterparts of the reference's bm_rasterize_points.py / bm_knn.py /
(no nerf bm in reference — ours times the trainer-step hot path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .roofline import measured_vpu_peak_flops
from .runner import BenchRow, time_fn, trace_dir_for, write_rows


def bench_points(n_points=100_000, image_size=256, K=8):
    from pytorch3d_tpu.renderer.points.rasterize_points_pallas import (
        rasterize_points_fragments_pallas,
    )

    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-0.9, 0.9, (n_points, 2)),
                rng.uniform(1.0, 4.0, (n_points, 1)),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    rad = jnp.full((n_points,), 0.01)
    valid = jnp.ones((n_points,), bool)
    fn = jax.jit(
        lambda p: rasterize_points_fragments_pallas(
            p, rad, valid, (image_size, image_size), K
        )
    )
    name = f"points_{n_points//1000}k_{image_size}px_K{K}"
    dt = time_fn(lambda: fn(pts), trace_dir=trace_dir_for(name))
    return [
        BenchRow(
            name=name,
            ms=dt * 1e3,
            unit_rate=n_points / dt / 1e6,
            unit="Mpts/s",
        )
    ]


def bench_knn(N=100_000, M=100_000, D=3, K=8):
    from pytorch3d_tpu.ops import knn_points

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, N, D), jnp.float32)
    y = jnp.asarray(rng.randn(1, M, D), jnp.float32)
    fn = jax.jit(lambda x, y: knn_points(x, y, K=K))
    name = f"knn_{N//1000}k_{M//1000}k_D{D}_K{K}"
    dt = time_fn(lambda: fn(x, y), trace_dir=trace_dir_for(name))
    # roofline: the distance matrix is an MXU matmul 2*N*M*D flops plus
    # |y|^2 broadcast adds N*M; top-K dominates beyond that.
    flops = 2 * N * M * D + N * M
    return [
        BenchRow(
            name=name,
            ms=dt * 1e3,
            unit_rate=N * M / dt / 1e9,
            unit="Gpair/s",
            extra={"dist_matrix_tflops": flops / dt / 1e12},
        )
    ]


def bench_nerf_step(n_rays=4096, n_pts=64, dtype=None, mixed=False):
    """One jitted coarse+fine NeRF train step (the project-nerf hot path;
    reference baseline 0.18 s/it on Quadro GP100, projects/nerf/README).

    dtype=jnp.bfloat16 runs the MLPs with bf16 activations and fp32
    params (one MXU pass per matmul instead of fp32's multi-pass);
    mixed=True additionally casts the params to bf16 for fwd/bwd with
    fp32 masters (make_nerf_train_step compute_dtype)."""
    import optax

    from pytorch3d_tpu.models import RadianceFieldRenderer
    from pytorch3d_tpu.parallel import make_nerf_train_step
    from pytorch3d_tpu.renderer import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )

    model = RadianceFieldRenderer(
        image_width=400,
        image_height=400,
        n_pts_per_ray=n_pts,
        n_pts_per_ray_fine=n_pts,
        n_rays_per_image=n_rays,
        min_depth=2.0,
        max_depth=6.0,
        n_hidden_neurons_xyz=256,
        n_hidden_neurons_dir=128,
        n_layers_xyz=8,
        **({"dtype": dtype} if dtype is not None else {}),
    )
    R, T = look_at_view_transform(dist=4.0, elev=20.0, azim=30.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T, znear=0.5, zfar=10.0)
    image = jnp.ones((1, 400, 400, 3), jnp.float32) * 0.5
    key = jax.random.PRNGKey(0)
    params = model.init(jax.random.PRNGKey(1), cams, image=image, key=key)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    step = make_nerf_train_step(
        model,
        optimizer,
        compute_dtype=jnp.bfloat16 if mixed else None,
    )

    tag = "_bf16" if dtype == jnp.bfloat16 else ""
    if mixed:
        tag += "_mixed"
    name = f"nerf_step_{n_rays}rays_{2*n_pts}pts_mlp256x8{tag}"
    dt = time_fn(
        lambda: step(params, opt_state, cams, image, key),
        trace_dir=trace_dir_for(name),
    )
    return [
        BenchRow(
            name=name,
            ms=dt * 1e3,
            unit_rate=n_rays / dt / 1e6,
            unit="Mrays/s",
            extra={"ref_sec_per_it_gp100": 0.18},
        )
    ]


def main(out="BENCH_GRID_ops.json"):
    rows = []
    for fn in (
        bench_points,
        bench_knn,
        bench_nerf_step,
        lambda: bench_nerf_step(dtype=jnp.bfloat16),
        lambda: bench_nerf_step(dtype=jnp.bfloat16, mixed=True),
    ):
        try:
            r = fn()
            for row in r:
                print(row.line(), flush=True)
            rows.extend(r)
        except Exception as e:  # keep the grid robust to one bad row
            print(f"SKIP {fn.__name__}: {e}", flush=True)
    write_rows(rows, out)
    return rows


if __name__ == "__main__":
    main()
