"""Pallas TPU kernels for point rasterization.

Same architecture as the mesh path (renderer/mesh/rasterize_pallas.py),
mirroring csrc/rasterize_points/ (naive :87, fine :223, backward :366):

1. XLA binning: point bbox (center +- radius) vs (32, 128) pixel tiles,
   first-come per-tile lists with live counts.
2. Fine Pallas kernel: per-tile SMEM point lists (x, y, z, r rows), pixel-
   parallel coverage + ascending-z K-slot insertion, emitting idx / zbuf /
   dists directly.
3. Backward Pallas kernel: per-tile reduction of (gz, gdists) cotangents
   into per-point (x, y, z) gradients — no scatter (the reference's
   RasterizePointsBackwardCudaKernel atomicAdd equivalent).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh.rasterize_meshes import pix_to_non_square_ndc

_TILE_H = 32
_TILE_W = 128
_CHUNK = 1024  # points per streamed SMEM chunk (shared by select + grad)
_MPT_HARD_CAP = 32768  # absolute per-tile point-list capacity (32 chunks)

from ..mesh.rasterize_pallas import _tile_for_k  # noqa: E402  (shared rule:
# the K-deep per-pixel state makes the kernels' scoped-VMEM stack grow as
# K*TH, so tile height shrinks for K > 32)


def _tile_axis_masks(points, radius, valid, image_size, tile):
    """Per-axis tile-overlap masks oy (n_ty, P) / ox (n_tx, P) + ok (P,)
    — the shared geometric predicate of both binning strategies."""
    H, W = image_size
    TH, TW = tile
    n_ty = -(-H // TH)
    n_tx = -(-W // TW)

    x = points[:, 0]
    y = points[:, 1]
    xmin = x - radius
    xmax = x + radius
    ymin = y - radius
    ymax = y + radius

    rows0 = jnp.arange(n_ty) * TH
    rows1 = jnp.minimum(rows0 + TH, H) - 1
    cols0 = jnp.arange(n_tx) * TW
    cols1 = jnp.minimum(cols0 + TW, W) - 1
    ty_max = pix_to_non_square_ndc(H - 1 - rows0, H, W)
    ty_min = pix_to_non_square_ndc(H - 1 - rows1, H, W)
    tx_max = pix_to_non_square_ndc(W - 1 - cols0, W, H)
    tx_min = pix_to_non_square_ndc(W - 1 - cols1, W, H)
    half_px = float(max(2.0 * max(H / W, 1.0) / H, 2.0 * max(W / H, 1.0) / W))

    oy = (ymin[None, :] <= ty_max[:, None] + half_px) & (
        ymax[None, :] >= ty_min[:, None] - half_px
    )
    ox = (xmin[None, :] <= tx_max[:, None] + half_px) & (
        xmax[None, :] >= tx_min[:, None] - half_px
    )
    ok = valid & (points[:, 2] >= 0)
    return oy, ox, ok, n_ty, n_tx


def required_tiles_per_point(
    points: jnp.ndarray,
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    image_size: Tuple[int, int],
    tile: Tuple[int, int] = (_TILE_H, _TILE_W),
) -> jnp.ndarray:
    """Exact (max_y_tiles, max_x_tiles) any point overlaps — host-side
    sizing for the sort-based binning's static expansion factor (the
    analog of required_points_per_tile)."""
    oy, ox, ok, _, _ = _tile_axis_masks(
        points, radius, valid, image_size, tile
    )
    cy = jnp.sum(oy.astype(jnp.int32), axis=0) * ok.astype(jnp.int32)
    cx = jnp.sum(ox.astype(jnp.int32), axis=0) * ok.astype(jnp.int32)
    return jnp.stack([jnp.max(cy), jnp.max(cx)])


def _ids_topk(oy, ox, ok, n_ty, n_tx, P, max_points_per_tile):
    """Original binning: per-tile top_k over the full (n_tiles, P)
    overlap matrix.  Exact for any radius, but the top_k is O(n_tiles*P)
    and dominates end-to-end time at P ~ 1e6 (measured 641 of 711 ms at
    1024^2) — the sort path below replaces it when the caller can bound
    tiles-per-point statically."""
    overlap = oy[:, None, :] & ox[None, :, :] & ok[None, None, :]
    overlap = overlap.reshape(n_ty * n_tx, P)
    score = jnp.where(
        overlap, -jnp.arange(P, dtype=jnp.float32)[None], -jnp.inf
    )
    top, _ = jax.lax.top_k(score, min(max_points_per_tile, P))
    filled = jnp.isfinite(top)
    return jnp.where(filled, (-top).astype(jnp.int32), -1)


def _ids_sorted(oy, ox, ok, n_ty, n_tx, P, max_points_per_tile,
                max_tiles_per_point):
    """Sort-based CSR binning: expand each point to its (contiguous)
    tile range — at most TY*TX pairs, static — stable-sort the pairs by
    tile, and gather each tile's leading MPT entries.  O(P*TY*TX log)
    instead of O(n_tiles*P); produces the SAME ids (ascending point id
    per tile, lowest ids kept on overflow) as the top_k path."""
    TY, TX = max_tiles_per_point
    n_tiles = n_ty * n_tx
    # contiguous per-axis ranges: [lo, lo+cnt)
    lo_y = jnp.argmax(oy, axis=0).astype(jnp.int32)
    cnt_y = jnp.sum(oy.astype(jnp.int32), axis=0)
    lo_x = jnp.argmax(ox, axis=0).astype(jnp.int32)
    cnt_x = jnp.sum(ox.astype(jnp.int32), axis=0)

    u = jnp.arange(TY, dtype=jnp.int32)[:, None, None]  # (TY, 1, 1)
    v = jnp.arange(TX, dtype=jnp.int32)[None, :, None]  # (1, TX, 1)
    live = (
        (u < cnt_y[None, None, :])
        & (v < cnt_x[None, None, :])
        & ok[None, None, :]
    )
    t_id = (lo_y[None, None, :] + u) * n_tx + (lo_x[None, None, :] + v)
    t_id = jnp.where(live, t_id, n_tiles)  # dead pairs sort last
    pid = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[None, None, :], t_id.shape
    )
    # pid-major flatten + stable sort by tile -> ascending pid per tile
    t_flat = jnp.moveaxis(t_id, -1, 0).reshape(-1)
    p_flat = jnp.moveaxis(pid, -1, 0).reshape(-1)
    t_sorted, p_sorted = jax.lax.sort(
        (t_flat, p_flat), dimension=0, is_stable=True, num_keys=1
    )
    starts = jnp.searchsorted(t_sorted, jnp.arange(n_tiles, dtype=jnp.int32))
    ends = jnp.searchsorted(
        t_sorted, jnp.arange(n_tiles, dtype=jnp.int32), side="right"
    )
    counts = jnp.minimum(ends - starts, max_points_per_tile)
    i = jnp.arange(max_points_per_tile, dtype=jnp.int32)[None, :]
    pos = jnp.minimum(starts[:, None] + i, t_sorted.shape[0] - 1)
    ids = jnp.where(i < counts[:, None], p_sorted[pos], -1)
    return ids


def _bin_points(
    points: jnp.ndarray,  # (P, 3)
    radius: jnp.ndarray,  # (P,)
    valid: jnp.ndarray,  # (P,)
    image_size: Tuple[int, int],
    max_points_per_tile: int,
    tile: Tuple[int, int] = (_TILE_H, _TILE_W),
    max_tiles_per_point: Optional[Tuple[int, int]] = None,
):
    P = points.shape[0]
    oy, ox, ok, n_ty, n_tx = _tile_axis_masks(
        points, radius, valid, image_size, tile
    )
    if max_tiles_per_point is None:
        ids = _ids_topk(oy, ox, ok, n_ty, n_tx, P, max_points_per_tile)
    else:
        ids = _ids_sorted(
            oy, ox, ok, n_ty, n_tx, P,
            min(max_points_per_tile, P), max_tiles_per_point,
        )
    filled = ids >= 0

    g_pts = points[jnp.maximum(ids, 0)]  # (n_tiles, MPT, 3)
    g_rad = radius[jnp.maximum(ids, 0)]
    dead = jnp.asarray([2.0, 2.0, -1.0], points.dtype)
    g_pts = jnp.where(filled[..., None], g_pts, dead)
    g_rad = jnp.where(filled, g_rad, 0.0)
    counts = jnp.sum(filled.astype(jnp.int32), axis=-1)
    counts_smem = jnp.broadcast_to(
        counts[:, None, None], (counts.shape[0], 1, 128)
    )
    # rows: x, y, z, r  -> (n_tiles, 4, MPT)
    data = jnp.concatenate(
        [jnp.moveaxis(g_pts, 1, 2), g_rad[:, None, :]], axis=1
    )
    return data, ids[:, None, :], counts_smem, n_ty, n_tx


@functools.partial(
    jax.jit, static_argnames=("image_size", "tile")
)
def required_points_per_tile(
    points: jnp.ndarray,
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    image_size: Tuple[int, int],
    tile: Tuple[int, int] = (_TILE_H, _TILE_W),
) -> jnp.ndarray:
    """Exact per-tile point-list capacity (max over tiles of the bbox
    overlap count) — the points analog of the mesh path's
    required_faces_per_tile; pulsar-scale callers use it to size the
    streamed lists with no silent drops."""
    H, W = image_size
    TH, TW = tile
    n_ty = -(-H // TH)
    n_tx = -(-W // TW)
    x = points[:, 0]
    y = points[:, 1]
    rows0 = jnp.arange(n_ty) * TH
    rows1 = jnp.minimum(rows0 + TH, H) - 1
    cols0 = jnp.arange(n_tx) * TW
    cols1 = jnp.minimum(cols0 + TW, W) - 1
    ty_max = pix_to_non_square_ndc(H - 1 - rows0, H, W)
    ty_min = pix_to_non_square_ndc(H - 1 - rows1, H, W)
    tx_max = pix_to_non_square_ndc(W - 1 - cols0, W, H)
    tx_min = pix_to_non_square_ndc(W - 1 - cols1, W, H)
    half_px = float(
        max(2.0 * max(H / W, 1.0) / H, 2.0 * max(W / H, 1.0) / W)
    )
    ok = valid & (points[:, 2] >= 0)
    oy = ((y - radius)[None, :] <= ty_max[:, None] + half_px) & (
        (y + radius)[None, :] >= ty_min[:, None] - half_px
    )
    ox = ((x - radius)[None, :] <= tx_max[:, None] + half_px) & (
        (x + radius)[None, :] >= tx_min[:, None] - half_px
    )
    counts = jnp.einsum(
        "tp,xp->tx",
        (oy & ok[None]).astype(jnp.int32),
        ox.astype(jnp.int32),
    )
    return jnp.max(counts)


def _pixel_coords(tile_h, tile_w, ty, tx, H, W):
    rr = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    cc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    rows = ty.astype(jnp.float32) * tile_h + rr
    cols = tx.astype(jnp.float32) * tile_w + cc
    ns_y = 2.0 * max(H / W, 1.0)
    ns_x = 2.0 * max(W / H, 1.0)
    py = -(ns_y / 2.0) + (ns_y * (H - 1 - rows) + ns_y / 2.0) / H
    px = -(ns_x / 2.0) + (ns_x * (W - 1 - cols) + ns_x / 2.0) / W
    return px, py


def _fine_kernel(
    data_ref,  # (4, MPT) SMEM: x, y, z, r
    ids_ref,  # (1, MPT) SMEM
    count_ref,  # (1, 128) SMEM
    idx_out,  # (K, TH, TW)
    z_out,
    d_out,
    *,
    n_tx: int,
    image_size: Tuple[int, int],
    points_per_pixel: int,
    tile: Tuple[int, int] = (_TILE_H, _TILE_W),
):
    """Chunk-streamed per-tile select: the per-tile point list arrives in
    (4, CH) SMEM chunks over grid dim 1; the K-slot insertion state is
    carried ACROSS chunks through the output refs (initialized at chunk 0),
    exactly like the mesh fine kernel — this lifts the old 4096 whole-list
    SMEM cap to _MPT_HARD_CAP (needed by pulsar-scale sphere counts)."""
    H, W = image_size
    TH, TW = tile
    K = points_per_pixel
    CH = data_ref.shape[1]
    c = pl.program_id(1)
    t = pl.program_id(0)
    ty = t // n_tx
    tx = t % n_tx
    px, py = _pixel_coords(TH, TW, ty, tx, H, W)

    @pl.when(c == 0)
    def _init():
        inf_tile = jnp.full((TH, TW), jnp.inf, jnp.float32)
        neg1_tile = jnp.full((TH, TW), -1, jnp.int32)
        zero_tile = jnp.zeros((TH, TW), jnp.float32)
        for k in range(K):
            idx_out[k] = neg1_tile
            z_out[k] = inf_tile
            d_out[k] = zero_tile

    def body(j, best):
        cx = data_ref[0, j]
        cy = data_ref[1, j]
        cz = data_ref[2, j]
        cr = data_ref[3, j]
        pid = ids_ref[0, j]
        d2 = (px - cx) ** 2 + (py - cy) ** 2
        covers = (d2 < cr * cr) & (cz >= 0.0)
        cand = (
            jnp.where(covers, cz, jnp.inf),
            jnp.where(covers, pid, -1),
            jnp.where(covers, d2, 0.0),
        )
        cur = cand
        out = []
        for k in range(K):
            take = cur[0] < best[k][0]
            merged = tuple(
                jnp.where(take, cur[c], best[k][c]) for c in range(3)
            )
            cur = tuple(
                jnp.where(take, best[k][c], cur[c]) for c in range(3)
            )
            out.append(merged)
        return tuple(out)

    # NOTE: a 4x unroll of this loop (mesh-kernel style) was measured
    # NEUTRAL on the fwd and a 4x REGRESSION on the grad kernel at
    # MPT=32768 (VMEM pressure from concurrent per-point tile
    # temporaries) — the points kernels stay un-unrolled; the binning,
    # not this loop, dominated end-to-end time (see _ids_sorted).
    init = tuple(
        (z_out[k], idx_out[k], d_out[k]) for k in range(K)
    )
    n_live = jnp.clip(count_ref[0, 0] - c * CH, 0, CH)
    best = jax.lax.fori_loop(0, n_live, body, init)
    for k in range(K):
        idx_out[k] = best[k][1]
        z_out[k] = best[k][0]
        d_out[k] = best[k][2]


def _grad_kernel(
    data_ref,  # (4, MPT) SMEM
    ids_ref,  # (1, MPT) SMEM
    count_ref,  # (1, 128) SMEM
    idx_ref,  # (K, TH, TW)
    gz_ref,  # (K, TH, TW)
    gd_ref,  # (K, TH, TW)
    gout_ref,  # (3, MPT) SMEM per-slot point grads
    *,
    n_tx: int,
    image_size: Tuple[int, int],
    points_per_pixel: int,
    tile: Tuple[int, int] = (_TILE_H, _TILE_W),
):
    H, W = image_size
    TH, TW = tile
    K = points_per_pixel
    CH = data_ref.shape[1]
    c = pl.program_id(1)
    t = pl.program_id(0)
    ty = t // n_tx
    tx = t % n_tx
    px, py = _pixel_coords(TH, TW, ty, tx, H, W)

    idx_all = [idx_ref[k] for k in range(K)]
    gz_all = [gz_ref[k] for k in range(K)]
    gd_all = [gd_ref[k] for k in range(K)]

    def body(j, _):
        pid = ids_ref[0, j]
        cgz = jnp.zeros((TH, TW), jnp.float32)
        cgd = jnp.zeros((TH, TW), jnp.float32)
        hit = pid >= 0
        for k in range(K):
            m = ((idx_all[k] == pid) & hit).astype(jnp.float32)
            cgz = cgz + m * gz_all[k]
            cgd = cgd + m * gd_all[k]

        def local_loss(cx, cy, cz):
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            return jnp.sum(cgz * cz + cgd * d2)

        gx, gy, gz = jax.grad(local_loss, argnums=(0, 1, 2))(
            data_ref[0, j], data_ref[1, j], data_ref[2, j]
        )
        gout_ref[0, j] = gx
        gout_ref[1, j] = gy
        gout_ref[2, j] = gz
        return 0

    def zero_body(j, _):
        for r in range(3):
            gout_ref[r, j] = 0.0
        return 0

    n_live = jnp.clip(count_ref[0, 0] - c * CH, 0, CH)
    jax.lax.fori_loop(n_live, CH, zero_body, 0)
    jax.lax.fori_loop(0, n_live, body, 0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def rasterize_points_fragments_pallas(
    points: jnp.ndarray,  # (P, 3) NDC xy + view z
    radius: jnp.ndarray,  # (P,)
    valid: jnp.ndarray,  # (P,)
    image_size: Tuple[int, int],
    points_per_pixel: int = 8,
    max_points_per_tile: Optional[int] = None,
    max_tiles_per_point: Optional[Tuple[int, int]] = None,
):
    """(idx, zbuf, dists2); zbuf/dists differentiable wrt points.

    max_tiles_per_point: static (y_tiles, x_tiles) bound (see
    required_tiles_per_point) selecting the O(P log) sort-based binning;
    None keeps the O(n_tiles*P) top_k binning (exact for any radius
    without host-side sizing)."""
    out, _ = _rpf_fwd(
        points, radius, valid, image_size, points_per_pixel,
        max_points_per_tile, max_tiles_per_point,
    )
    return out


def _rpf_fwd(points, radius, valid, image_size, points_per_pixel,
             max_points_per_tile, max_tiles_per_point=None):
    H, W = image_size
    K = points_per_pixel
    P = points.shape[0]
    mpt = max_points_per_tile
    if mpt is None:
        mpt = int(min(P, max(1024, P // 4)))
    # per-tile lists stream through SMEM in _CHUNK-point chunks (grid
    # dim 1), so capacity is bounded by the streaming cap, not whole-list
    # SMEM residency
    mpt = max(128, min(-(-mpt // 128) * 128, -(-P // 128) * 128))
    if mpt > _CHUNK:
        mpt = min(-(-mpt // _CHUNK) * _CHUNK, _MPT_HARD_CAP)

    tile = _tile_for_k(K)
    TH, TW = tile
    data, ids, counts, n_ty, n_tx = _bin_points(
        jax.lax.stop_gradient(points), radius, valid, image_size, mpt,
        tile, max_tiles_per_point,
    )
    n_tiles = n_ty * n_tx
    MPT = data.shape[2]
    CH = min(MPT, _CHUNK)
    n_chunks = MPT // CH

    kernel = functools.partial(
        _fine_kernel,
        n_tx=n_tx,
        image_size=image_size,
        points_per_pixel=K,
        tile=tile,
    )
    tspec = pl.BlockSpec(
        (K, TH, TW), lambda t, c: (0, t // n_tx, t % n_tx)
    )
    fshape = jax.ShapeDtypeStruct(
        (K, n_ty * TH, n_tx * TW), jnp.float32
    )
    idx_o, z_o, d_o = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((None, 4, CH), lambda t, c: (t, 0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, CH), lambda t, c: (t, 0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 128), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[tspec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((K, n_ty * TH, n_tx * TW), jnp.int32),
            fshape,
            fshape,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(data, ids, counts)

    def crop(x):
        return jnp.moveaxis(x, 0, -1)[:H, :W]

    idx = crop(idx_o)
    empty = idx < 0
    zbuf = jnp.where(empty, -1.0, crop(z_o))
    dists = jnp.where(empty, -1.0, crop(d_o))
    out = (idx, zbuf, dists)
    res = (data, ids, counts, idx, jnp.zeros((P, 0), jnp.float32))
    return out, res


def _rpf_bwd(image_size, points_per_pixel, max_points_per_tile,
             max_tiles_per_point, res, g):
    data, ids, counts, idx, p_marker = res
    P = p_marker.shape[0]
    _, gz, gd = g
    K = points_per_pixel
    tile = _tile_for_k(K)  # must match the fwd binning tile
    TH, TW = tile
    n_tx = -(-image_size[1] // TW)
    n_tiles, _, MPT = data.shape
    n_ty = n_tiles // n_tx
    Hp, Wp = n_ty * TH, n_tx * TW
    CH = min(MPT, _CHUNK)
    n_chunks = MPT // CH

    def pad_kmaj(x):
        x = jnp.moveaxis(x, -1, 0)
        return jnp.pad(
            x, ((0, 0), (0, Hp - image_size[0]), (0, Wp - image_size[1]))
        )

    kernel = functools.partial(
        _grad_kernel,
        n_tx=n_tx,
        image_size=image_size,
        points_per_pixel=K,
        tile=tile,
    )
    tspec = pl.BlockSpec(
        (K, TH, TW), lambda t, c: (0, t // n_tx, t % n_tx)
    )
    gout = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((None, 4, CH), lambda t, c: (t, 0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, CH), lambda t, c: (t, 0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 128), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            tspec, tspec, tspec,
        ],
        out_specs=pl.BlockSpec(
            (None, 3, CH), lambda t, c: (t, 0, c), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3, MPT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(data, ids, counts, pad_kmaj(idx), pad_kmaj(gz), pad_kmaj(gd))

    flat_ids = ids.reshape(-1)
    flat_g = jnp.moveaxis(gout, 1, 2).reshape(-1, 3)
    flat_g = jnp.where((flat_ids >= 0)[:, None], flat_g, 0.0)
    grad_points = jax.ops.segment_sum(
        flat_g, jnp.maximum(flat_ids, 0), num_segments=P
    )
    return grad_points, None, None


rasterize_points_fragments_pallas.defvjp(_rpf_fwd, _rpf_bwd)
