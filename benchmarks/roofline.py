"""Roofline model for the TPU rasterizer kernels.

The reference externalizes perf to fvcore benchmarks with no model
(SURVEY §5); we go further: an analytic VPU-op count of the fine-kernel
inner loop plus *measured* per-chip peaks, so every benchmark row reports
achieved fraction-of-roofline (BASELINE.json: >=70% on the fine kernel).

Peaks are measured, not quoted: a saturating Pallas FMA microkernel gives
attainable VPU ops/s on the actual chip (paper TFLOPs numbers conflate
MXU+VPU and are not achievable by elementwise code).
"""

from __future__ import annotations

import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# --------------------------------------------------------------------------- #
# Measured VPU peak
# --------------------------------------------------------------------------- #


def _vpu_kernel(x_ref, o_ref, *, n_iter: int):
    """Dependent-chain-free FMA storm: 8 independent accumulators so the
    VPU pipeline stays full; ~n_iter*16 flops per element."""
    x = x_ref[...]
    accs = [x + float(i) for i in range(8)]

    def body(i, accs):
        a0, a1, a2, a3, a4, a5, a6, a7 = accs
        a0 = a0 * 1.000001 + 0.5
        a1 = a1 * 0.999999 + 0.25
        a2 = a2 * 1.000002 + 0.125
        a3 = a3 * 0.999998 + 0.0625
        a4 = a4 * 1.000003 + 0.03125
        a5 = a5 * 0.999997 + 0.015625
        a6 = a6 * 1.000004 + 0.0078125
        a7 = a7 * 0.999996 + 0.00390625
        return (a0, a1, a2, a3, a4, a5, a6, a7)

    accs = jax.lax.fori_loop(0, n_iter, body, tuple(accs))
    o_ref[...] = sum(accs)


@functools.lru_cache(maxsize=1)
def measured_vpu_peak_flops() -> float:
    """Sustained fp32 VPU FLOP/s on the current default device.

    Runs a compute-bound Pallas microkernel (fma chains over an (256, 1024)
    VMEM block) and counts 2 flops per fma. Cached per process.
    """
    if jax.default_backend() != "tpu":
        # CPU fallback: just return a nominal figure so ratios stay finite.
        return 1e11
    shape = (64, 512)
    n_iter = 8192
    flops_per_elem = n_iter * 16  # 8 fmas * 2 flops per iter

    kern = functools.partial(_vpu_kernel, n_iter=n_iter)
    run = jax.jit(
        lambda x: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )
    x = jnp.ones(shape, jnp.float32)
    # time_fn does the honest remote-queue sync (block_until_ready can
    # return early under the axon tunnel and inflate the measured peak)
    from .runner import time_fn

    dt = time_fn(lambda: run(x), warmup=2, iters=10)
    return shape[0] * shape[1] * flops_per_elem / dt


@functools.lru_cache(maxsize=1)
def measured_hbm_bandwidth() -> float:
    """Sustained HBM bytes/s via a big jnp copy (read+write counted)."""
    if jax.default_backend() != "tpu":
        return 1e11
    n = 256 * 1024 * 1024 // 4  # 256 MB
    x = jnp.arange(n, dtype=jnp.float32)
    run = jax.jit(lambda x: x * 1.0000001)
    from .runner import time_fn

    dt = time_fn(lambda: run(x), warmup=1, iters=5)
    return 2 * n * 4 / dt


# --------------------------------------------------------------------------- #
# Fine-kernel op model
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=1)
def measured_vpu_issue_ops() -> float:
    """Sustained mixed-op VPU issue rate (vector ops/s, lanes included).

    The fine rasterization kernel's op mix is fma/mul/cmp/select — ops
    the VPU multi-issues across ports.  A pure-FMA chain measures ~0.67
    ops/lane-cycle (latency-bound); mixed microkernels sustain 2+.  The
    probe runs several op mixes and takes the best, but remains a LOWER
    bound on the hardware ceiling: the KNN kernel demonstrates ~4.0
    Tops/s of useful work (full quad-issue), so roofline fractions
    against this denominator can overstate closeness up to ~2x — read
    them comparatively, not absolutely (see PERF_ANALYSIS.md)."""
    if jax.default_backend() != "tpu":
        return 1e11
    shape = (64, 512)
    n_iter = 2048
    from .runner import time_fn

    def probe(n_chains, wide):
        def kern(x_ref, o_ref):
            x = x_ref[...]
            accs = [x * (1.0 + 0.01 * i) for i in range(n_chains)]
            thr = [x + 0.5 + 0.01 * i for i in range(n_chains)]

            def body(i, accs):
                out = []
                for j, a in enumerate(accs):
                    v = a * 1.000001 + 0.01          # fma
                    take = v < thr[j]                 # cmp
                    w = jnp.where(take, v, a * 0.999999)  # select + mul
                    if wide:
                        w = w * 1.0000005 + 0.002     # second fma
                        w = jnp.minimum(w, thr[j] + 2.0)  # min (+add)
                    out.append(w)
                return tuple(out)

            accs = jax.lax.fori_loop(0, n_iter, body, tuple(accs))
            o_ref[...] = sum(accs)

        run = jax.jit(
            lambda x: pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32)
            )(x)
        )
        x = jnp.ones(shape, jnp.float32)
        dt = time_fn(lambda: run(x), warmup=2, iters=10)
        ops_per = 7 if wide else 4
        return shape[0] * shape[1] * n_iter * n_chains * ops_per / dt

    return max(
        probe(4, False), probe(8, False), probe(4, True), probe(8, True)
    )


@functools.lru_cache(maxsize=1)
def demonstrated_vpu_issue_ops() -> float:
    """Calibrated multi-issue ceiling: the best issue rate DEMONSTRATED
    by a shipped kernel on this chip, measured live (VERDICT r4 weak#4:
    the mixed-op probe is a lower bound — committed grids showed fracs
    up to 1.69 against it, so it cannot adjudicate absolute targets).

    The demonstrator is the KNN streaming-insertion kernel
    (ops/knn_pallas.py) at 50k x 50k, D=3, K=8 — the same
    lanes-by-SMEM-stream architecture as the rasterizer kernels, whose
    useful-op rate was measured at ~2x the probe (PERF_ANALYSIS.md
    "Other hot paths").  Analytic useful ops per candidate pair:
      distance D=3: 3 sub + 3 mul + 2 add        = 8
      K=8 ascending insertion: (cmp + 2 select)  = 24
      index bookkeeping + validity               = 6
    -> 38 ops/pair.  Returns max(probe, knn_rate) so the denominator
    never falls below the probe."""
    probe = measured_vpu_issue_ops()
    if jax.default_backend() != "tpu":
        return probe
    from .runner import time_fn

    try:
        from pytorch3d_tpu.ops.knn_pallas import knn_points_pallas_single

        n = 50_000
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (n, 3))
        b = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        run = jax.jit(
            lambda: knn_points_pallas_single(
                a, b, jnp.asarray(n, jnp.int32), K=8, norm=2
            )
        )
        run()
        dt = time_fn(lambda: run(), warmup=2, iters=5)
        knn_rate = n * n * 38 / dt
    except Exception:  # pragma: no cover — calibration must not break a run
        return probe
    return max(probe, knn_rate)


def calibration_scale() -> float:
    """probe/demonstrated ratio (<= 1): multiply a probe-based
    roofline_frac by this to get the calibrated fraction."""
    return measured_vpu_issue_ops() / demonstrated_vpu_issue_ops()


def fine_kernel_flops_per_candidate(
    faces_per_pixel: int,
    blur: bool,
    emit_fragments: bool = True,
    perspective_correct: bool = False,
) -> int:
    """VPU flops per (face candidate x pixel) in _fine_kernel's body.

    Counted off rasterize_pallas._fine_kernel (each mul/add/sub/div/cmp/
    select = 1 flop; matches how the VPU retires them):
      edge fns e0..e2 21, area+inv 9, w0..w2 3, pz 5, inside ~5,
      seg-dists (blur or emit) ~70, covers/select ~7,
      insertion chain: cmp + 2*channels selects per K slot.
    """
    f = 21 + 9 + 3 + 5 + 5 + 7
    if perspective_correct:
        f += 12
    channels = 6 if emit_fragments else 2
    if blur or emit_fragments:
        f += 70
    f += faces_per_pixel * (1 + 2 * channels)
    return f


def grad_kernel_flops_per_candidate(
    faces_per_pixel: int,
    perspective_correct: bool = True,
) -> int:
    """VPU ops per (face candidate x pixel) in _grad_kernel's body.

    Counted off rasterize_pallas._grad_kernel (post the round-4 manual
    segment-distance VJP):
      cotangent collection 13/K-slot, z/bary chain fwd ~62 + mechanical
      reverse ~124 (jax.grad, one shared reverse pass for all 9 args),
      segment-distance fwd ~49 (3 segs + min chain + winner masks),
      closed-form segment grads ~39, per-face reductions amortize to
      ~15/pixel.  Replaces the old "model backward as 2x the forward"
      convention, which undercounted the true backward work by ~1.6-1.9x
      and made the fwd+bwd roofline_frac column structurally unreachable
      at low K (VERDICT r3 weak#5; EXP_GRAD_K3.json)."""
    f = 62 + 124 + 49 + 39 + 15
    if not perspective_correct:
        f -= 36  # rational-bary fwd+reverse ops absent
    return f + 13 * faces_per_pixel


def grad_kernel_roofline_s(
    face_verts,
    valid,
    image_size: Tuple[int, int],
    blur_radius: float,
    faces_per_pixel: int,
    perspective_correct: bool = True,
) -> float:
    """Ideal seconds for the backward pass (same candidate walk as the
    fine kernel, op count from grad_kernel_flops_per_candidate)."""
    cand = raster_candidates(
        face_verts, valid, image_size, blur_radius, faces_per_pixel
    )
    fl = grad_kernel_flops_per_candidate(faces_per_pixel, perspective_correct)
    return cand * fl / measured_vpu_issue_ops()


def raster_candidates(
    face_verts,
    valid,
    image_size: Tuple[int, int],
    blur_radius: float,
    faces_per_pixel: int = 1,
) -> int:
    """Total candidate (face x pixel) evaluations the tile kernel performs:
    sum over tiles of bbox-overlap count x pixels per tile (tile shape is
    K-dependent, see rasterize_pallas._tile_for_k)."""
    from pytorch3d_tpu.renderer.mesh.rasterize_pallas import (
        _tile_for_k,
        _tile_overlap,
    )

    tile = _tile_for_k(faces_per_pixel)
    overlap, _, _ = _tile_overlap(
        face_verts, valid, image_size, blur_radius, tile
    )
    return int(jnp.sum(overlap.astype(jnp.int64))) * tile[0] * tile[1]


def fine_kernel_roofline_s(
    face_verts,
    valid,
    image_size: Tuple[int, int],
    blur_radius: float,
    faces_per_pixel: int,
    emit_fragments: bool = True,
    perspective_correct: bool = False,
) -> float:
    """Ideal seconds for the fine pass: per-candidate vector-op count
    executed at the measured mixed-op VPU issue rate (the kernel's ops
    are mostly non-FMA compares/selects, so an op roofline — not a FLOP
    roofline — is the meaningful speed-of-light)."""
    cand = raster_candidates(
        face_verts, valid, image_size, blur_radius, faces_per_pixel
    )
    fl = fine_kernel_flops_per_candidate(
        faces_per_pixel, blur_radius > 0, emit_fragments, perspective_correct
    )
    return cand * fl / measured_vpu_issue_ops()
