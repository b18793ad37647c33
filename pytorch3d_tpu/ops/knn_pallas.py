"""Pallas TPU kernel for exact K-nearest-neighbors.

The XLA path (ops/knn.py) computes chunked distance matrices and runs
`lax.top_k` per chunk plus an argsort merge — top_k's sorting network
dominates (measured 6.4 s at 100k x 100k). This kernel reuses the
rasterizer's streaming-selection architecture (rasterize_pallas.py):

- queries ride the VPU lanes in (Q_TILE,) blocks (grid dim 0),
- database points stream through SMEM in (D+1, CHUNK) coordinate-major
  chunks (grid dim 1; Pallas double-buffers the DMA),
- each step evaluates _UNROLL independent distance chains against the
  whole query tile and feeds a K-deep ascending insertion chain held in
  the VMEM-resident output blocks (the kernels are latency-bound, same
  finding as PERF_ANALYSIS.md).

Exact same results as the XLA path (strict `<` keeps earlier indices on
ties = ascending-index tie order of a sequential scan).  D (coordinate
count) must be small (<= 8); K <= 16.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_TILE = 1024  # queries per block: (8, 128) fp32 tile
_CHUNK = 1024  # database points per streamed SMEM chunk
_UNROLL = 4


def _knn_kernel(
    db_ref,  # (D, CH) SMEM database-chunk coords
    qx_ref,  # (D, 8, 128) VMEM query coords (block)
    count_ref,  # (1, 128) SMEM live database count
    d_out,  # (K, 8, 128) ascending best distances
    i_out,  # (K, 8, 128) matching indices
    *,
    D: int,
    K: int,
    norm: int,
):
    CH = db_ref.shape[1]
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        for k in range(K):
            d_out[k] = jnp.full((8, 128), float("inf"), jnp.float32)
            i_out[k] = jnp.full((8, 128), 0, jnp.int32)

    q = [qx_ref[d] for d in range(D)]  # D x (8, 128)
    n_live = jnp.clip(count_ref[0, 0] - c * CH, 0, CH)

    def candidate(j):
        dist = jnp.zeros((8, 128), jnp.float32)
        for d in range(D):
            diff = q[d] - db_ref[d, j]
            dist = dist + (diff * diff if norm == 2 else jnp.abs(diff))
        idx = (c * CH + j).astype(jnp.int32)
        # dead slots (j >= n_live) are padded with +inf coords -> inf dist
        return dist, idx

    def insert(cand, best):
        cd, ci = cand
        ci_t = jnp.full((8, 128), ci, jnp.int32)
        cur = (cd, ci_t)
        out = []
        for k in range(K):
            take = cur[0] < best[k][0]
            merged = tuple(
                jnp.where(take, cur[i], best[k][i]) for i in range(2)
            )
            cur = tuple(
                jnp.where(take, best[k][i], cur[i]) for i in range(2)
            )
            out.append(merged)
        return tuple(out)

    def body(b, best):
        j0 = b * _UNROLL
        cands = [candidate(j0 + u) for u in range(_UNROLL)]
        for cand in cands:
            best = insert(cand, best)
        return best

    @pl.when(n_live > 0)
    def _work():
        best = tuple((d_out[k], i_out[k]) for k in range(K))
        n_blocks = (n_live + _UNROLL - 1) // _UNROLL
        best = jax.lax.fori_loop(0, n_blocks, body, best)
        for k in range(K):
            d_out[k] = best[k][0]
            i_out[k] = best[k][1]


@functools.partial(jax.jit, static_argnames=("K", "norm"))
def knn_points_pallas_single(
    p1: jnp.ndarray,  # (P1, D) queries
    p2: jnp.ndarray,  # (P2, D) database
    length2: Optional[jnp.ndarray] = None,  # () int32 live database count
    K: int = 1,
    norm: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact ascending KNN for one cloud pair: (P1, K) dists + indices."""
    P1, D = p1.shape
    P2 = p2.shape[0]
    if D > 8 or K > 16:
        raise ValueError("knn_pallas supports D <= 8, K <= 16")

    n_q = -(-P1 // _Q_TILE)
    q_pad = n_q * _Q_TILE - P1
    # queries coordinate-major (D, n_q, 8, 128)
    qp = jnp.pad(p1, ((0, q_pad), (0, 0)))
    qx = jnp.moveaxis(qp, 1, 0).reshape(D, n_q, 8, 128)

    n_c = -(-P2 // _CHUNK)
    c_pad = n_c * _CHUNK - P2
    # dead database slots get +inf coords -> never selected
    dbp = jnp.pad(p2, ((0, c_pad), (0, 0)), constant_values=1e30)
    if length2 is not None:
        live = jnp.arange(P2 + c_pad, dtype=jnp.int32) < length2
        dbp = jnp.where(live[:, None], dbp, 1e30)
        count = jnp.minimum(length2, P2)
    else:
        count = jnp.int32(P2)
    db = jnp.moveaxis(dbp, 1, 0)  # (D, n_c * CHUNK)
    counts = jnp.broadcast_to(count[None, None], (1, 128))

    kernel = functools.partial(_knn_kernel, D=D, K=K, norm=norm)
    d_out, i_out = pl.pallas_call(
        kernel,
        grid=(n_q, n_c),
        in_specs=[
            pl.BlockSpec(
                (D, _CHUNK), lambda q, c: (0, c), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((D, None, 8, 128), lambda q, c: (0, q, 0, 0)),
            pl.BlockSpec(
                (1, 128), lambda q, c: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((K, None, 8, 128), lambda q, c: (0, q, 0, 0)),
            pl.BlockSpec((K, None, 8, 128), lambda q, c: (0, q, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, n_q, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((K, n_q, 8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(db, qx, counts)

    dists = jnp.moveaxis(d_out.reshape(K, -1), 0, 1)[:P1]
    idx = jnp.moveaxis(i_out.reshape(K, -1), 0, 1)[:P1]
    empty = jnp.isinf(dists)
    return jnp.where(empty, 0.0, dists), jnp.where(empty, 0, idx)
