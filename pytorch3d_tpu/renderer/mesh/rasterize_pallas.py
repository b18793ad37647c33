"""Pallas TPU kernel for the mesh-rasterization selection pass.

This is the TPU equivalent of the reference's coarse+fine CUDA scheme
(csrc/rasterize_coarse/rasterize_coarse.cu:76 binning,
csrc/rasterize_meshes/rasterize_meshes.cu:630 fine kernel):

1. **Binning (XLA)**: per-face NDC bounding boxes are intersected with
   image tiles; each tile gets a static-capacity list of overlapping faces
   (first-come order via the top_k(-idx) trick — no atomics, unlike the
   CUDA bitmask+atomicAdd binning).  Unlike round 1 (and unlike the CUDA
   path, which warns-and-drops at kMaxFacesPerBin,
   rasterize_coarse.cu:192-199), capacity is no longer SMEM-bound: the
   per-tile lists are **streamed through SMEM in chunks** (see below), so
   the public entry sizes the lists to the exact per-tile maximum
   (`required_faces_per_tile`) and nothing is dropped.
2. **Fine (Pallas)**: grid (n_tiles, n_chunks).  Each grid step DMAs one
   (9, CHUNK) coordinate-major chunk of the tile's face list into SMEM
   (faces ride the lane dimension; Pallas double-buffers the streamed
   chunks automatically) and a `fori_loop` walks the live faces,
   evaluating edge functions / z / blur-distance for the whole (32, 128)
   pixel block on the VPU and maintaining per-pixel ascending-z top-K
   buffers with a K-step vectorized insertion chain (the register MinK of
   mink.cuh:41, but SIMD-wide across the tile).  The top-K state lives in
   the output blocks (which stay VMEM-resident across the chunk grid
   dimension) plus one VMEM scratch for the select-only path's z keys.

Only the integer selection runs here; barycentrics/z/dists are recomputed
differentiably outside (rasterize_meshes.interpolate_fragments) on the XLA
path, while the fused path below pairs the select kernel with a per-tile
gradient-reduction kernel (no scatter).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_meshes import kEpsilon, pix_to_non_square_ndc

_TILE_H = 32  # pixel-tile rows (4 VPU sublane groups)
_TILE_W = 128  # pixel-tile cols (one full lane dim)
# face-loop unroll (independent geometry chains per step; see _fine_kernel)
import os as _os

_UNROLL = int(_os.environ.get("P3D_RASTER_UNROLL", "4"))
# experiment flag: skip the per-face AD chain in the grad kernel when no
# pixel of the tile selected the face (see _grad_kernel)
_GRAD_SKIP = _os.environ.get("P3D_GRAD_SKIP", "0") == "1"
# Tile-recentred affine edge functions (PERF_ANALYSIS.md headroom #1).
# w_i = (e_center_i + dx*B_i + dy*C_i) * inv_area with ALL coefficients
# (premultiplied by inv_area) computed subtract-first on the scalar unit
# at the TILE CENTER, so the per-pixel work is 2 vector FMAs per
# barycentric (6 total) instead of ~18 ops. Unlike the global affine
# form (A + B*px + C*py, measured 4e-4 z error at ico2/128²), the
# recentred form's cancellation magnitude is bounded by the tile
# half-extent, not the pixel-to-vertex distance, so it is at least as
# precise as the vertex-centered form whenever faces are larger than a
# tile and within ~1 decimal digit of it for sub-tile faces (measured:
# ≤4e-4 relative z/bary error on 0.15% of an ico2/128² render's pixels,
# the rest bit-identical — see TestAffineEdgeMode).
# Experimental: pix_to_face may differ from the XLA oracle at pixels
# within fp rounding of an edge (coverage ties), so it is opt-in.
_AFFINE = _os.environ.get("P3D_RASTER_AFFINE", "0") == "1"
_CHUNK = 1024  # faces per streamed SMEM chunk (shared by select + grad)
_MFT_HARD_CAP = 32768  # absolute per-tile face-list capacity (32 chunks)


def _tile_for(K: int, F: int, H: int) -> Tuple[int, int]:
    """F- and size-aware pixel tile.

    Small face lists at large images are Pallas-program-launch bound:
    every 32-row tile bins nearly the whole mesh and does almost no
    work, so a 64-row tile (half the programs) wins 25-41% fwd+bwd on
    ico0-ico2 at 512^2/1024^2 (EXP_SMALLMESH.json round 5).  Gated to
    K*64 <= 512 — the emit kernel holds ~12 (K, TH, TW) fp32 planes and
    K8/TH128 measured 16.78M scoped vmem vs Mosaic's 16M limit — and to
    H >= 256 so banded/sharded callers with few tile rows keep their
    row granularity."""
    if F <= 2048 and K * 64 <= 512 and H >= 256:
        return (64, _TILE_W)
    return _tile_for_k(K)


def _tile_for_k(K: int) -> Tuple[int, int]:
    """Pixel-tile shape for a given faces_per_pixel.

    The fine kernel holds ~12 live (K, TH, TW) fp32 planes (top-K
    insertion state plus double-buffered fragment outputs), so its
    scoped-VMEM stack grows as K*TH*TW.  Measured on v5e: K=50 at TH=32
    needs an 18.5 MB stack vs Mosaic's 16 MB limit.  Keep K*TH <= 1024
    (the tuned 32-row tile is unchanged for the common K <= 32)."""
    if K * _TILE_H <= 1024:
        return (_TILE_H, _TILE_W)
    return (16 if K * 16 <= 1024 else 8, _TILE_W)


def _round_mft(mft: int, F: int) -> int:
    """Round a per-tile capacity to the kernels' chunk granularity."""
    mft = max(128, min(mft, F, _MFT_HARD_CAP))
    if mft <= _CHUNK:
        return -(-mft // 128) * 128
    return min(-(-mft // _CHUNK) * _CHUNK, _MFT_HARD_CAP)


def _heuristic_mft(
    F: int, image_size: Tuple[int, int], tile: Tuple[int, int]
) -> int:
    """Static capacity guess when the exact requirement is unavailable
    (mirrors reference rasterize_meshes.py:222 max_faces_per_bin).

    When the image is covered by only a few tiles, most faces land in
    every tile, so a fractional-F guess silently drops faces (at 64px an
    ico5's 20k faces all overlap the single tile pair; F//4 dropped 75%
    of them with no recourse on runtimes without host callbacks).  Use
    full-F capacity below 8 tiles — the cost is small exactly when the
    tile count is small.

    At many tiles the per-tile expectation is F/n_tiles, so capacity is
    8x that (measured: ico6 at 1024² needs 4.1x the mean; the capacity-
    scaling costs are the per-tile coordinate gather and the dead-chunk
    streaming — EXP_1024.json recorded fwd+bwd 443 ms at the old F//4
    guess vs 154 ms exact-sized).  The old F//4 remains the floor's cap
    so mid tile counts never get a smaller list than before."""
    n_tiles = -(-image_size[0] // tile[0]) * -(-image_size[1] // tile[1])
    if n_tiles < 8:
        return _round_mft(F, F)
    guess = max(1024, min(F // 4, 8 * (F // n_tiles)))
    return _round_mft(int(min(F, guess)), F)


def _tile_overlap(
    face_verts: jnp.ndarray,  # (F, 3, 3)
    valid: jnp.ndarray,  # (F,)
    image_size: Tuple[int, int],
    blur_radius: float,
    tile: Tuple[int, int],
):
    """(n_tiles, F) bool face/tile conservative overlap + grid dims."""
    H, W = image_size
    tile_h, tile_w = tile
    n_ty = -(-H // tile_h)
    n_tx = -(-W // tile_w)
    bl = float(blur_radius) ** 0.5 if blur_radius > 0 else 0.0

    x = face_verts[:, :, 0]
    y = face_verts[:, :, 1]
    xmin = jnp.min(x, axis=1) - bl
    xmax = jnp.max(x, axis=1) + bl
    ymin = jnp.min(y, axis=1) - bl
    ymax = jnp.max(y, axis=1) + bl

    # tile NDC bounds; row 0 is +y (top), col 0 is +x (left)
    rows0 = jnp.arange(n_ty) * tile_h
    rows1 = jnp.minimum(rows0 + tile_h, H) - 1
    cols0 = jnp.arange(n_tx) * tile_w
    cols1 = jnp.minimum(cols0 + tile_w, W) - 1
    ty_max = pix_to_non_square_ndc(H - 1 - rows0, H, W)
    ty_min = pix_to_non_square_ndc(H - 1 - rows1, H, W)
    tx_max = pix_to_non_square_ndc(W - 1 - cols0, W, H)
    tx_min = pix_to_non_square_ndc(W - 1 - cols1, W, H)
    half_px = float(max(2.0 * max(H / W, 1.0) / H, 2.0 * max(W / H, 1.0) / W))

    oy = (ymin[None, :] <= ty_max[:, None] + half_px) & (
        ymax[None, :] >= ty_min[:, None] - half_px
    )  # (n_ty, F)
    ox = (xmin[None, :] <= tx_max[:, None] + half_px) & (
        xmax[None, :] >= tx_min[:, None] - half_px
    )  # (n_tx, F)
    overlap = oy[:, None, :] & ox[None, :, :] & valid[None, None, :]
    return overlap.reshape(n_ty * n_tx, -1), n_ty, n_tx


@functools.partial(
    jax.jit, static_argnames=("image_size", "blur_radius", "tile")
)
def required_faces_per_tile(
    face_verts: jnp.ndarray,
    valid: jnp.ndarray,
    image_size: Tuple[int, int],
    blur_radius: float = 0.0,
    tile: Tuple[int, int] = (_TILE_H, _TILE_W),
) -> jnp.ndarray:
    """Exact per-tile face-list capacity needed so the binning drops nothing.

    Returns a scalar int32 (max over tiles of the conservative bbox-overlap
    count).  Cheap (one (n_tiles, F) mask reduction); the eager public entry
    uses it to size the Pallas face lists exactly, eliminating the silent
    drops of the CUDA kMaxFacesPerBin heuristic (rasterize_coarse.cu:192).
    """
    v0, v1, v2 = face_verts[:, 0], face_verts[:, 1], face_verts[:, 2]
    area = (v2[:, 0] - v0[:, 0]) * (v1[:, 1] - v0[:, 1]) - (
        v2[:, 1] - v0[:, 1]
    ) * (v1[:, 0] - v0[:, 0])
    zmax = jnp.maximum(jnp.maximum(v0[:, 2], v1[:, 2]), v2[:, 2])
    ok = valid & (zmax >= 0) & ~((area <= kEpsilon) & (area >= -kEpsilon))
    overlap, _, _ = _tile_overlap(face_verts, ok, image_size, blur_radius, tile)
    return jnp.max(jnp.sum(overlap.astype(jnp.int32), axis=-1))


def _bin_faces(
    face_verts: jnp.ndarray,  # (F, 3, 3)
    valid: jnp.ndarray,  # (F,)
    image_size: Tuple[int, int],
    blur_radius: float,
    tile,
    max_faces_per_tile: int,
    row_band=None,
):
    """Assign faces to tiles -> (n_tiles, 9, MFT) coord-major + ids + counts.

    Also returns `n_dropped`: total faces dropped across tiles because a
    tile's overlap count exceeded the static capacity (0 when the caller
    sized capacity with required_faces_per_tile).

    `row_band=(ty0, n_ty_local)` restricts binning to `n_ty_local` tile
    rows starting at (possibly traced) row `ty0` — the face lists, ids and
    counts then cover only that band, in the same ascending-id order as the
    full grid, so a banded rasterization is bit-identical to the matching
    rows of the full one.
    """
    F = face_verts.shape[0]
    overlap, n_ty, n_tx = _tile_overlap(
        face_verts, valid, image_size, blur_radius, tile
    )
    if row_band is not None:
        ty0, n_ty_local = row_band
        ov = overlap.reshape(n_ty, n_tx, F)
        ov = jax.lax.dynamic_slice_in_dim(ov, ty0, n_ty_local, axis=0)
        overlap = ov.reshape(n_ty_local * n_tx, F)
        n_ty = n_ty_local

    # first-MFT face ids per tile (ascending face id order)
    score = jnp.where(overlap, -jnp.arange(F, dtype=jnp.float32)[None], -jnp.inf)
    top, _ = jax.lax.top_k(score, min(max_faces_per_tile, F))
    filled = jnp.isfinite(top)
    ids = jnp.where(filled, (-top).astype(jnp.int32), -1)
    # Pad the slot dim up to the requested (chunk-granular) capacity: the
    # fine kernels stream MFT // CHUNK full chunks, so a list shorter than
    # the rounded capacity would silently lose its tail (F < mft case).
    pad = max_faces_per_tile - ids.shape[1]
    if pad > 0:
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        filled = jnp.pad(filled, ((0, 0), (0, pad)))

    gathered = face_verts[jnp.maximum(ids, 0)]  # (n_tiles, MFT, 3, 3)
    # dropped slots must never cover any pixel: z < 0 kills them
    dead = jnp.asarray(
        [[2.0, 2.0, -1.0], [2.0, 2.0, -1.0], [2.0, 2.0, -1.0]],
        face_verts.dtype,
    )
    gathered = jnp.where(filled[:, :, None, None], gathered, dead)
    counts = jnp.sum(filled.astype(jnp.int32), axis=-1)  # (n_tiles,)
    full_counts = jnp.sum(overlap.astype(jnp.int32), axis=-1)
    n_dropped = jnp.sum(jnp.maximum(full_counts - counts, 0))
    # counts padded to a (1, 128) SMEM tile per grid step
    counts_smem = jnp.broadcast_to(counts[:, None, None], (counts.shape[0], 1, 128))
    # coordinate-major layout: (n_tiles, 9, MFT)
    fv9 = jnp.moveaxis(gathered.reshape(gathered.shape[0], -1, 9), 1, 2)
    return fv9, ids[:, None, :], counts_smem, n_ty, n_tx, n_dropped


def _seg_dist2(px, py, ax, ay, bx, by):
    """Squared distance of the (vector) pixel coords to a segment whose
    endpoints are SCALARS: the reciprocal/degenerate handling runs on the
    scalar unit, leaving ~10 vector ops per segment."""
    vx = bx - ax
    vy = by - ay
    l2 = vx * vx + vy * vy
    inv_l2 = 1.0 / jnp.maximum(l2, kEpsilon)  # scalar
    tpar = ((px - ax) * vx + (py - ay) * vy) * inv_l2
    tpar = jnp.clip(tpar, 0.0, 1.0)
    tpar = jnp.where(l2 <= kEpsilon, 1.0, tpar)
    dx = px - (ax + tpar * vx)
    dy = py - (ay + tpar * vy)
    return dx * dx + dy * dy


def _pixel_ndc(n_tx: int, image_size, tile, ty0=0):
    """(tile_h, tile_w) NDC pixel-center coords of the current grid tile.

    `ty0` (static int or traced scalar read from SMEM) offsets the tile row
    — used by the row-band sharded path (parallel/raster.py) where each
    device rasterizes its own horizontal band of the full image."""
    H, W = image_size
    tile_h, tile_w = tile
    t = pl.program_id(0)
    ty = t // n_tx + ty0
    tx = t % n_tx
    rr = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    cc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    rows = ty.astype(jnp.float32) * tile_h + rr
    cols = tx.astype(jnp.float32) * tile_w + cc
    ns_y = 2.0 * max(H / W, 1.0)
    ns_x = 2.0 * max(W / H, 1.0)
    py = -(ns_y / 2.0) + (ns_y * (H - 1 - rows) + ns_y / 2.0) / H
    px = -(ns_x / 2.0) + (ns_x * (W - 1 - cols) + ns_x / 2.0) / W
    return px, py


def _tile_center_ndc(n_tx: int, image_size, tile, ty0=0):
    """Scalar NDC coords of the current grid tile's center pixel.

    The same affine map as _pixel_ndc evaluated at the fractional center
    (tile_h-1)/2, (tile_w-1)/2 — pure scalar-unit arithmetic."""
    H, W = image_size
    tile_h, tile_w = tile
    t = pl.program_id(0)
    ty = t // n_tx + ty0
    tx = t % n_tx
    rows_c = ty.astype(jnp.float32) * tile_h + (tile_h - 1) / 2.0
    cols_c = tx.astype(jnp.float32) * tile_w + (tile_w - 1) / 2.0
    ns_y = 2.0 * max(H / W, 1.0)
    ns_x = 2.0 * max(W / H, 1.0)
    pcy = -(ns_y / 2.0) + (ns_y * (H - 1 - rows_c) + ns_y / 2.0) / H
    pcx = -(ns_x / 2.0) + (ns_x * (W - 1 - cols_c) + ns_x / 2.0) / W
    return pcx, pcy


def _fine_kernel(
    fv_ref,  # (9, CH) coord-major face-chunk in SMEM
    ids_ref,  # (1, CH)
    count_ref,  # (1, 128) SMEM number of live faces in this tile
    idx_out,  # (K, TH, TW)
    z_out,  # (K, T, T) or None
    b0_out,  # (K, T, T)
    b1_out,
    b2_out,
    d_out,
    zscr,  # (K, TH, TW) VMEM scratch z keys (select-only path) or None
    *,
    emit_fragments: bool,
    n_tx: int,
    image_size: Tuple[int, int],
    blur_radius: float,
    faces_per_pixel: int,
    perspective_correct: bool,
    clip_barycentric_coords: bool,
    tile: Tuple[int, int],
    ty0=0,
):
    K = faces_per_pixel
    tile_h, tile_w = tile
    CH = fv_ref.shape[1]
    c = pl.program_id(1)
    px, py = _pixel_ndc(n_tx, image_size, tile, ty0)
    if _AFFINE:
        pcx, pcy = _tile_center_ndc(n_tx, image_size, tile, ty0)
        dxp = px - pcx  # tile-local pixel offsets, |dx| <= half tile
        dyp = py - pcy

    inf_tile = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
    neg1_tile = jnp.full((tile_h, tile_w), -1, jnp.int32)
    zero_tile = jnp.zeros((tile_h, tile_w), jnp.float32)

    @pl.when(c == 0)
    def _init():
        for k in range(K):
            idx_out[k] = neg1_tile
            if emit_fragments:
                z_out[k] = inf_tile
                b0_out[k] = zero_tile
                b1_out[k] = zero_tile
                b2_out[k] = zero_tile
                d_out[k] = zero_tile
            else:
                zscr[k] = inf_tile

    n_live = jnp.clip(count_ref[0, 0] - c * CH, 0, CH)

    def candidate(j):
        # ---- scalar-unit precomputation from the SMEM face coords ----
        v0x = fv_ref[0, j]
        v0y = fv_ref[1, j]
        v0z = fv_ref[2, j]
        v1x = fv_ref[3, j]
        v1y = fv_ref[4, j]
        v1z = fv_ref[5, j]
        v2x = fv_ref[6, j]
        v2y = fv_ref[7, j]
        v2z = fv_ref[8, j]
        fid = ids_ref[0, j]

        # area = edge_function(v2; v0, v1) (matches rasterize_meshes.py)
        area = (v2x - v0x) * (v1y - v0y) - (v2y - v0y) * (v1x - v0x)
        inv_area = 1.0 / (area + kEpsilon)

        # Edge functions stay in the vertex-centered form: the affine
        # a + b*px + c*py refactoring is 2 FMAs but loses ~log2(1/area)
        # bits to cancellation on small faces (measured 4e-4 z error at
        # ico2/128px); the subtract-first form is exact near the vertex.
        # The scalar unit precomputes the edge deltas.
        d01x = v2x - v1x
        d01y = v2y - v1y
        d12x = v0x - v2x
        d12y = v0y - v2y
        d20x = v1x - v0x
        d20y = v1y - v0y
        if _AFFINE:
            # recentred affine form: all coefficients (premultiplied by
            # inv_area) on the scalar unit; 2 vector FMAs per w.
            a0 = ((pcx - v1x) * d01y - (pcy - v1y) * d01x) * inv_area
            a1 = ((pcx - v2x) * d12y - (pcy - v2y) * d12x) * inv_area
            a2 = ((pcx - v0x) * d20y - (pcy - v0y) * d20x) * inv_area
            b0, c0 = d01y * inv_area, -d01x * inv_area
            b1, c1 = d12y * inv_area, -d12x * inv_area
            b2, c2 = d20y * inv_area, -d20x * inv_area
            w0 = (a0 + dxp * b0) + dyp * c0
            w1 = (a1 + dxp * b1) + dyp * c1
            w2 = (a2 + dxp * b2) + dyp * c2
        else:
            e0 = (px - v1x) * d01y - (py - v1y) * d01x
            e1 = (px - v2x) * d12y - (py - v2y) * d12x
            e2 = (px - v0x) * d20y - (py - v0y) * d20x
            w0 = e0 * inv_area
            w1 = e1 * inv_area
            w2 = e2 * inv_area
        inside = (w0 > 0.0) & (w1 > 0.0) & (w2 > 0.0)

        if perspective_correct:
            s0 = v1z * v2z
            s1 = v0z * v2z
            s2 = v0z * v1z
            t0 = w0 * s0
            t1 = w1 * s1
            t2 = w2 * s2
            rdenom = 1.0 / jnp.maximum(t0 + t1 + t2, kEpsilon)
            wz0, wz1, wz2 = t0 * rdenom, t1 * rdenom, t2 * rdenom
        else:
            wz0, wz1, wz2 = w0, w1, w2
        if clip_barycentric_coords:
            wz0 = jnp.maximum(wz0, 0.0)
            wz1 = jnp.maximum(wz1, 0.0)
            wz2 = jnp.maximum(wz2, 0.0)
            rwsum = 1.0 / jnp.maximum(wz0 + wz1 + wz2, 1e-5)
            wz0, wz1, wz2 = wz0 * rwsum, wz1 * rwsum, wz2 * rwsum
        pz = wz0 * v0z + wz1 * v1z + wz2 * v2z

        if blur_radius > 0.0 or emit_fragments:
            d2 = _seg_dist2(px, py, v0x, v0y, v1x, v1y)
            d2 = jnp.minimum(d2, _seg_dist2(px, py, v1x, v1y, v2x, v2y))
            d2 = jnp.minimum(d2, _seg_dist2(px, py, v0x, v0y, v2x, v2y))
        if blur_radius > 0.0:
            covers = inside | (d2 < blur_radius)
        else:
            covers = inside

        zero_area = jnp.abs(area) <= kEpsilon
        covers = covers & (pz >= 0.0) & jnp.logical_not(zero_area)

        cz = jnp.where(covers, pz, jnp.inf)
        ci = jnp.where(covers, fid, -1)
        if emit_fragments:
            sdist = jnp.where(inside, -d2, d2)
            return (cz, ci, wz0, wz1, wz2, sdist)
        return (cz, ci)

    def insert(cand, best):
        cur = cand
        new_slots = []
        for k in range(K):
            take = cur[0] < best[k][0]
            merged = tuple(
                jnp.where(take, cur[i], best[k][i])
                for i in range(len(cur))
            )
            cur = tuple(
                jnp.where(take, best[k][i], cur[i])
                for i in range(len(cur))
            )
            new_slots.append(merged)
        return tuple(new_slots)

    # NOTE: a tau-skip (lax.cond around the insertion chain when no
    # pixel can accept the face) was measured SLOWER on v5e (+34% at
    # ico4/512, +74% on the emit path): Mosaic round-trips the large
    # loop carry through VMEM at the cond boundary every iteration,
    # which costs more than the skipped vector ops. Keep the chain
    # unconditional.
    #
    # The face loop is UNROLLED: each step evaluates _UNROLL independent
    # candidate geometry chains before their (serial) insertions, so the
    # per-face latency chains overlap — the kernel is latency-bound, not
    # issue-bound (measured ~0.8 vector-ops/cycle vs ~13/cycle peak).
    # Overshooting n_live is safe: binning pads dead slots with z=-1
    # coords whose candidates never cover.
    def body(b, best):
        j0 = b * _UNROLL
        cands = [candidate(j0 + u) for u in range(_UNROLL)]
        for cand in cands:
            best = insert(cand, best)
        return best

    @pl.when(n_live > 0)
    def _work():
        # top-K state persists across the chunk grid dimension in the
        # VMEM-resident output blocks (+ zscr for the select-only z keys)
        if emit_fragments:
            best = tuple(
                (z_out[k], idx_out[k], b0_out[k], b1_out[k], b2_out[k],
                 d_out[k])
                for k in range(K)
            )
        else:
            best = tuple((zscr[k], idx_out[k]) for k in range(K))
        n_blocks = (n_live + _UNROLL - 1) // _UNROLL
        best = jax.lax.fori_loop(0, n_blocks, body, best)
        for k in range(K):
            idx_out[k] = best[k][1]
            if emit_fragments:
                z_out[k] = best[k][0]
                b0_out[k] = best[k][2]
                b1_out[k] = best[k][3]
                b2_out[k] = best[k][4]
                d_out[k] = best[k][5]
            else:
                zscr[k] = best[k][0]


def _face_ok(face_verts, valid, cull_backfaces):
    v0, v1, v2 = face_verts[:, 0], face_verts[:, 1], face_verts[:, 2]
    area = (v2[:, 0] - v0[:, 0]) * (v1[:, 1] - v0[:, 1]) - (
        v2[:, 1] - v0[:, 1]
    ) * (v1[:, 0] - v0[:, 0])
    zmax = jnp.maximum(jnp.maximum(v0[:, 2], v1[:, 2]), v2[:, 2])
    ok = valid & (zmax >= 0) & ~((area <= kEpsilon) & (area >= -kEpsilon))
    if cull_backfaces:
        ok = ok & (area >= 0)
    return ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size",
        "blur_radius",
        "faces_per_pixel",
        "perspective_correct",
        "clip_barycentric_coords",
        "cull_backfaces",
        "max_faces_per_tile",
        "tile",
    ),
)
def rasterize_topk_pallas(
    face_verts: jnp.ndarray,  # (F, 3, 3) NDC xy + view z
    valid: jnp.ndarray,  # (F,)
    image_size: Tuple[int, int],
    blur_radius: float = 0.0,
    faces_per_pixel: int = 1,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    max_faces_per_tile: Optional[int] = None,
    tile: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Per-pixel ascending-z top-K face ids via the Pallas tile kernel.

    Returns idx (H, W, K), -1 for empty slots.
    """
    H, W = image_size
    K = faces_per_pixel
    F = face_verts.shape[0]
    if tile is None:
        tile = _tile_for(K, F, H)
    TH, TW = tile

    ok = _face_ok(face_verts, valid, cull_backfaces)

    if max_faces_per_tile is None:
        mft = _heuristic_mft(F, image_size, tile)
    else:
        mft = _round_mft(max_faces_per_tile, F)

    fv9, ids, counts, n_ty, n_tx, _ = _bin_faces(
        face_verts, ok, image_size, blur_radius, tile, mft,
    )
    n_tiles = n_ty * n_tx
    MFT = fv9.shape[2]
    CH = min(MFT, _CHUNK)
    n_chunks = MFT // CH

    def kernel(fv_ref, ids_ref, count_ref, idx_out, zscr):
        _fine_kernel(
            fv_ref, ids_ref, count_ref, idx_out, None, None, None, None,
            None, zscr,
            emit_fragments=False,
            n_tx=n_tx,
            image_size=image_size,
            blur_radius=float(blur_radius),
            faces_per_pixel=K,
            perspective_correct=perspective_correct,
            clip_barycentric_coords=clip_barycentric_coords,
            tile=tile,
        )

    idx_out = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (None, 9, CH), lambda t, c: (t, 0, c), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (None, 1, CH), lambda t, c: (t, 0, c), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (None, 1, 128), lambda t, c: (t, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (K, TH, TW), lambda t, c: (0, t // n_tx, t % n_tx)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (K, n_ty * TH, n_tx * TW), jnp.int32
        ),
        scratch_shapes=[pltpu.VMEM((K, TH, TW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(fv9, ids, counts)

    return jnp.moveaxis(idx_out, 0, -1)[:H, :W]  # (H, W, K)


# --------------------------------------------------------------------------- #
# Hard rasterization fast path (MeshRasterizerOpenGL analog)
# --------------------------------------------------------------------------- #


def _hard_kernel(
    fv_ref,  # (9, CH) coord-major face-chunk in SMEM
    ids_ref,  # (1, CH)
    count_ref,  # (1, 128)
    idx_out,  # (1, TH, TW)
    z_out,  # (1, TH, TW)
    b0_out,  # (1, TH, TW)
    b1_out,
    b2_out,
    *,
    n_tx: int,
    image_size: Tuple[int, int],
    tile: Tuple[int, int],
):
    """K=1, no-blur, perspective-correct z-min rasterization.

    The TPU analog of the reference's OpenGL fast path
    (renderer/opengl/rasterizer_opengl.py:120): no blur distances, no
    top-K insertion chain, recentred-affine barycentrics — ~3x fewer
    inner-loop vector ops than the general fine kernel.  Depth test is
    a single compare+select over 5 planes."""
    tile_h, tile_w = tile
    CH = fv_ref.shape[1]
    c = pl.program_id(1)
    px, py = _pixel_ndc(n_tx, image_size, tile)
    pcx, pcy = _tile_center_ndc(n_tx, image_size, tile)
    dxp = px - pcx
    dyp = py - pcy

    @pl.when(c == 0)
    def _init():
        idx_out[0] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        z_out[0] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
        b0_out[0] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b1_out[0] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b2_out[0] = jnp.zeros((tile_h, tile_w), jnp.float32)

    n_live = jnp.clip(count_ref[0, 0] - c * CH, 0, CH)

    def candidate(j):
        v0x = fv_ref[0, j]
        v0y = fv_ref[1, j]
        v0z = fv_ref[2, j]
        v1x = fv_ref[3, j]
        v1y = fv_ref[4, j]
        v1z = fv_ref[5, j]
        v2x = fv_ref[6, j]
        v2y = fv_ref[7, j]
        v2z = fv_ref[8, j]
        fid = ids_ref[0, j]

        area = (v2x - v0x) * (v1y - v0y) - (v2y - v0y) * (v1x - v0x)
        inv_area = 1.0 / (area + kEpsilon)
        d01x, d01y = v2x - v1x, v2y - v1y
        d12x, d12y = v0x - v2x, v0y - v2y
        d20x, d20y = v1x - v0x, v1y - v0y
        a0 = ((pcx - v1x) * d01y - (pcy - v1y) * d01x) * inv_area
        a1 = ((pcx - v2x) * d12y - (pcy - v2y) * d12x) * inv_area
        a2 = ((pcx - v0x) * d20y - (pcy - v0y) * d20x) * inv_area
        w0 = (a0 + dxp * (d01y * inv_area)) + dyp * (-d01x * inv_area)
        w1 = (a1 + dxp * (d12y * inv_area)) + dyp * (-d12x * inv_area)
        w2 = (a2 + dxp * (d20y * inv_area)) + dyp * (-d20x * inv_area)
        inside = (w0 > 0.0) & (w1 > 0.0) & (w2 > 0.0)

        # perspective-correct barycentrics (the GL path always uses them)
        t0 = w0 * (v1z * v2z)
        t1 = w1 * (v0z * v2z)
        t2 = w2 * (v0z * v1z)
        rdenom = 1.0 / jnp.maximum(t0 + t1 + t2, kEpsilon)
        wz0, wz1, wz2 = t0 * rdenom, t1 * rdenom, t2 * rdenom
        pz = wz0 * v0z + wz1 * v1z + wz2 * v2z

        zero_area = jnp.abs(area) <= kEpsilon
        covers = inside & (pz >= 0.0) & jnp.logical_not(zero_area)
        return covers, pz, fid, wz0, wz1, wz2

    def body(b, best):
        bz, bi, b0, b1, b2 = best
        cands = [candidate(b * _UNROLL + u) for u in range(_UNROLL)]
        for covers, pz, fid, w0, w1, w2 in cands:
            take = covers & (pz < bz)
            bz = jnp.where(take, pz, bz)
            bi = jnp.where(take, fid, bi)
            b0 = jnp.where(take, w0, b0)
            b1 = jnp.where(take, w1, b1)
            b2 = jnp.where(take, w2, b2)
        return bz, bi, b0, b1, b2

    @pl.when(n_live > 0)
    def _work():
        best = (z_out[0], idx_out[0], b0_out[0], b1_out[0], b2_out[0])
        n_blocks = (n_live + _UNROLL - 1) // _UNROLL
        best = jax.lax.fori_loop(0, n_blocks, body, best)
        z_out[0], idx_out[0] = best[0], best[1]
        b0_out[0], b1_out[0], b2_out[0] = best[2], best[3], best[4]


@functools.partial(
    jax.jit, static_argnames=("image_size", "max_faces_per_tile")
)
def rasterize_hard_pallas(
    face_verts: jnp.ndarray,  # (F, 3, 3) NDC xy + view z
    valid: jnp.ndarray,  # (F,)
    image_size: Tuple[int, int],
    max_faces_per_tile: Optional[int] = None,
):
    """Hard K=1 rasterization: (pix_to_face, zbuf, bary) — no dists.

    Non-differentiable fast path (the OpenGL analog); gradients flow
    through shaders like SplatterPhongShader instead, exactly as the
    reference pairs MeshRasterizerOpenGL with splatter shading."""
    H, W = image_size
    F = face_verts.shape[0]
    tile = _tile_for(1, F, H)
    TH, TW = tile

    face_verts = jax.lax.stop_gradient(face_verts)
    ok = _face_ok(face_verts, valid, False)
    if max_faces_per_tile is None:
        mft = _heuristic_mft(F, image_size, tile)
    else:
        mft = _round_mft(max_faces_per_tile, F)
    fv9, ids, counts, n_ty, n_tx, _ = _bin_faces(
        face_verts, ok, image_size, 0.0, tile, mft
    )
    n_tiles = n_ty * n_tx
    MFT = fv9.shape[2]
    CH = min(MFT, _CHUNK)
    n_chunks = MFT // CH

    kernel = functools.partial(
        _hard_kernel, n_tx=n_tx, image_size=image_size, tile=tile
    )
    out_spec = pl.BlockSpec((1, TH, TW), lambda t, c: (0, t // n_tx, t % n_tx))
    fshape = jax.ShapeDtypeStruct((1, n_ty * TH, n_tx * TW), jnp.float32)
    idx, z, b0, b1, b2 = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((None, 9, CH), lambda t, c: (t, 0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, CH), lambda t, c: (t, 0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 128), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[out_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_ty * TH, n_tx * TW), jnp.int32),
            fshape, fshape, fshape, fshape,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(fv9, ids, counts)

    def crop(x):
        return jnp.moveaxis(x, 0, -1)[:H, :W]

    pix_to_face = crop(idx)
    empty = pix_to_face < 0
    zbuf = jnp.where(empty, -1.0, crop(z))
    bary = jnp.where(
        empty[..., None], -1.0,
        jnp.stack([crop(b0), crop(b1), crop(b2)], axis=-1),
    )
    return pix_to_face, zbuf, bary


# --------------------------------------------------------------------------- #
# Backward: per-tile face-gradient reduction kernel
# --------------------------------------------------------------------------- #


def _grad_kernel(
    fv_ref,  # (9, CH) SMEM face-chunk
    ids_ref,  # (1, CH) SMEM
    count_ref,  # (1, 128) SMEM
    idx_ref,  # (K, TH, TW) VMEM selected face ids
    gz_ref,  # (K, TH, TW) VMEM zbuf cotangent
    gb_ref,  # (3K, TH, TW) VMEM bary cotangent (k-major)
    gd_ref,  # (K, TH, TW) VMEM dists cotangent
    gout_ref,  # (9, CH) SMEM per-slot face-vertex grads for this chunk
    *,
    n_tx: int,
    image_size: Tuple[int, int],
    faces_per_pixel: int,
    perspective_correct: bool,
    clip_barycentric_coords: bool,
    tile: Tuple[int, int],
    ty0=0,
):
    """Gradient of (zbuf, bary, dists) wrt face verts, reduced per tile slot.

    For each face slot j in this chunk, accumulate the pixel cotangents of
    the K slots that selected face j and differentiate the fragment math
    (identical to rasterize_meshes._fragments_from_gathered) wrt the 9
    coordinates with in-kernel jax.grad — pure VPU reductions, no scatter.
    Chunks are independent (no carried state), so the grad output streams
    out chunk by chunk.
    """
    K = faces_per_pixel
    tile_h, tile_w = tile
    CH = fv_ref.shape[1]
    c = pl.program_id(1)
    px, py = _pixel_ndc(n_tx, image_size, tile, ty0)

    idx_all = [idx_ref[k] for k in range(K)]
    gz_all = [gz_ref[k] for k in range(K)]
    gb_all = [[gb_ref[3 * k + ch] for ch in range(3)] for k in range(K)]
    gd_all = [gd_ref[k] for k in range(K)]

    def body(j, _):
        fid = ids_ref[0, j]

        # combined cotangents for this face over the K slots
        cgz = jnp.zeros((tile_h, tile_w), jnp.float32)
        cgb = [jnp.zeros((tile_h, tile_w), jnp.float32) for _ in range(3)]
        cgd = jnp.zeros((tile_h, tile_w), jnp.float32)
        hit = (fid >= 0)
        any_m = jnp.zeros((tile_h, tile_w), jnp.bool_)
        for k in range(K):
            m = (idx_all[k] == fid) & hit
            if _GRAD_SKIP:
                any_m = any_m | m
            mf = m.astype(jnp.float32)
            cgz = cgz + mf * gz_all[k]
            for ch in range(3):
                cgb[ch] = cgb[ch] + mf * gb_all[k][ch]
            cgd = cgd + mf * gd_all[k]

        def local_loss_zb(v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
            # identical math to _fragments_from_gathered (z/bary part; the
            # segment-distance term is differentiated in closed form below)
            e0 = (px - v1x) * (v2y - v1y) - (py - v1y) * (v2x - v1x)
            e1 = (px - v2x) * (v0y - v2y) - (py - v2y) * (v0x - v2x)
            e2 = (px - v0x) * (v1y - v0y) - (py - v0y) * (v1x - v0x)
            area = (v2x - v0x) * (v1y - v0y) - (v2y - v0y) * (v1x - v0x)
            inv_area = 1.0 / (area + kEpsilon)
            w0 = e0 * inv_area
            w1 = e1 * inv_area
            w2 = e2 * inv_area
            inside = (w0 > 0.0) & (w1 > 0.0) & (w2 > 0.0)
            if perspective_correct:
                t0 = w0 * v1z * v2z
                t1 = v0z * w1 * v2z
                t2 = v0z * v1z * w2
                denom = jnp.maximum(t0 + t1 + t2, kEpsilon)
                b0, b1, b2 = t0 / denom, t1 / denom, t2 / denom
            else:
                b0, b1, b2 = w0, w1, w2
            if clip_barycentric_coords:
                c0 = jnp.maximum(b0, 0.0)
                c1 = jnp.maximum(b1, 0.0)
                c2 = jnp.maximum(b2, 0.0)
                csum = jnp.maximum(c0 + c1 + c2, 1e-5)
                b0, b1, b2 = c0 / csum, c1 / csum, c2 / csum
            pz = b0 * v0z + b1 * v1z + b2 * v2z
            loss = jnp.sum(
                cgz * pz + cgb[0] * b0 + cgb[1] * b1 + cgb[2] * b2
            )
            return loss, inside

        def _compute_grads():
            v = [fv_ref[r, j] for r in range(9)]
            grads, inside = jax.grad(
                local_loss_zb, argnums=tuple(range(9)), has_aux=True
            )(*v)
            grads = list(grads)
            v0x, v0y, _, v1x, v1y, _, v2x, v2y, _ = v

            # --- segment-distance gradient, closed form (envelope theorem).
            # For d2(p; a, b) with t = clip(dot(p-a, b-a)/|b-a|^2, 0, 1)
            # and diff = p - a - t*(b-a):  diff . (b-a) == 0 wherever t is
            # interior (stationarity) and dt == 0 wherever t is clamped or
            # the segment is degenerate, so in EVERY case
            #   d d2/da = -2*(1-t)*diff,   d d2/db = -2*t*diff
            # — ~12 vector ops per segment endpoint-pair versus ~45 for the
            # mechanical reverse of _seg_dist2 that jax.grad emits
            # (EXP_GRAD_K3.json: this is where the K3 backward time went).
            def seg(ax, ay, bx, by):
                vx = bx - ax
                vy = by - ay
                l2 = vx * vx + vy * vy
                inv_l2 = 1.0 / jnp.maximum(l2, kEpsilon)
                tpar = ((px - ax) * vx + (py - ay) * vy) * inv_l2
                tpar = jnp.clip(tpar, 0.0, 1.0)
                tpar = jnp.where(l2 <= kEpsilon, 1.0, tpar)
                dx = px - (ax + tpar * vx)
                dy = py - (ay + tpar * vy)
                return dx * dx + dy * dy, tpar, dx, dy

            d2a, ta, dxa, dya = seg(v0x, v0y, v1x, v1y)  # edge v0-v1
            d2b, tb, dxb, dyb = seg(v1x, v1y, v2x, v2y)  # edge v1-v2
            d2c, tc, dxc, dyc = seg(v0x, v0y, v2x, v2y)  # edge v0-v2
            # winner masks replicating jnp.minimum's VJP tie semantics:
            # min(min(d2a, d2b), d2c) routes the cotangent to the first
            # argument on ties (lax.le)
            m_ab = d2a <= d2b
            inner = jnp.minimum(d2a, d2b)
            m_in = inner <= d2c
            wa = m_in & m_ab
            wb = m_in & (~m_ab)
            wc = ~m_in
            s = jnp.where(inside, -cgd, cgd)  # sign flip of covered pixels

            def seg_grads(w, t, dx, dy):
                cot = jnp.where(w, s, 0.0) * (-2.0)
                ca = cot * (1.0 - t)
                cb = cot * t
                return ca * dx, ca * dy, cb * dx, cb * dy

            gax, gay, gbx, gby = seg_grads(wa, ta, dxa, dya)
            g2ax, g2ay, g2bx, g2by = seg_grads(wb, tb, dxb, dyb)
            g3ax, g3ay, g3bx, g3by = seg_grads(wc, tc, dxc, dyc)
            # endpoint layout: seg a = (v0, v1), seg b = (v1, v2),
            # seg c = (v0, v2)
            grads[0] += jnp.sum(gax + g3ax)   # v0x
            grads[1] += jnp.sum(gay + g3ay)   # v0y
            grads[3] += jnp.sum(gbx + g2ax)   # v1x
            grads[4] += jnp.sum(gby + g2ay)   # v1y
            grads[6] += jnp.sum(g2bx + g3bx)  # v2x
            grads[7] += jnp.sum(g2by + g3by)  # v2y
            for r in range(9):
                gout_ref[r, j] = grads[r]

        if _GRAD_SKIP:
            # most binned faces are selected by SOME pixel of their tile,
            # but occluded/overscanned faces are not — skip the whole AD
            # chain for them (grad body carries no loop state, so the
            # cond has none of the fwd kernel's VMEM round-trip cost)
            for r in range(9):
                gout_ref[r, j] = 0.0

            @pl.when(jnp.any(any_m))
            def _():
                _compute_grads()
        else:
            _compute_grads()
        return 0

    # zero the dead slots' outputs, then process only live faces.
    # Unrolled like the forward kernel (_UNROLL independent grad chains
    # per step — the kernel is latency-bound); overshooting n_live is
    # safe: dead slots have z=-1 coords, no selected pixels, and their
    # outputs are pre-zeroed by zero_body (body writes a 0 gradient).
    def zero_body(j, _):
        for r in range(9):
            gout_ref[r, j] = 0.0
        return 0

    def block_body(b, _):
        for u in range(_UNROLL):
            body(b * _UNROLL + u, 0)
        return 0

    n_live = jnp.clip(count_ref[0, 0] - c * CH, 0, CH)
    jax.lax.fori_loop(n_live, CH, zero_body, 0)
    n_blocks = (n_live + _UNROLL - 1) // _UNROLL
    jax.lax.fori_loop(0, n_blocks, block_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size",
        "faces_per_pixel",
        "perspective_correct",
        "clip_barycentric_coords",
        "n_tx",
        "F",
    ),
)
def rasterize_grad_pallas(
    fv9: jnp.ndarray,  # (n_tiles, 9, MFT) from _bin_faces
    ids: jnp.ndarray,  # (n_tiles, 1, MFT)
    counts: jnp.ndarray,  # (n_tiles, 1, 128)
    pix_to_face: jnp.ndarray,  # (H, W, K) selected ids
    gz: jnp.ndarray,  # (H, W, K)
    gbary: jnp.ndarray,  # (H, W, K, 3)
    gdists: jnp.ndarray,  # (H, W, K)
    F: int,
    image_size: Tuple[int, int],
    faces_per_pixel: int,
    perspective_correct: bool,
    clip_barycentric_coords: bool,
    n_tx: int,
    ty0: Optional[jnp.ndarray] = None,  # (1, 1) int32 band tile-row offset
) -> jnp.ndarray:
    """(F, 3, 3) gradient of the fragment outputs wrt face vertices.

    With `ty0` set, `pix_to_face`/cotangents cover only the row band
    starting at tile row ty0 of the full `image_size` grid (the fv9/ids/
    counts then come from the banded binning)."""
    H, W = image_size
    K = faces_per_pixel
    n_tiles, _, MFT = fv9.shape
    n_ty = n_tiles // n_tx
    tile = _tile_for(K, F, image_size[0])  # must match the fwd binning tile
    TH, TW = tile
    H_loc = pix_to_face.shape[0]  # == H unless banded
    Hp, Wp = n_ty * TH, n_tx * TW
    CH = min(MFT, _CHUNK)
    n_chunks = MFT // CH
    banded = ty0 is not None

    def pad_kmaj(x):  # (H_loc, W, K?) -> (K?, Hp, Wp)
        x = jnp.moveaxis(x, -1, 0)
        return jnp.pad(x, ((0, 0), (0, Hp - H_loc), (0, Wp - W)))

    idx_k = pad_kmaj(pix_to_face)
    gz_k = pad_kmaj(gz)
    gd_k = pad_kmaj(gdists)
    gb_k = jnp.moveaxis(gbary, (2, 3), (0, 1)).reshape(K * 3, H_loc, W)
    gb_k = jnp.pad(gb_k, ((0, 0), (0, Hp - H_loc), (0, Wp - W)))

    def kernel(fv_ref, ids_ref, count_ref, *rest):
        if banded:
            band_ref = rest[0]
            refs = rest[1:]
            ty0_val = band_ref[0, 0]
        else:
            refs = rest
            ty0_val = 0
        idx_ref, gz_ref, gb_ref, gd_ref, gout_ref = refs
        _grad_kernel(
            fv_ref, ids_ref, count_ref, idx_ref, gz_ref, gb_ref, gd_ref,
            gout_ref,
            n_tx=n_tx,
            image_size=image_size,
            faces_per_pixel=K,
            perspective_correct=perspective_correct,
            clip_barycentric_coords=clip_barycentric_coords,
            tile=tile,
            ty0=ty0_val,
        )

    tspec = lambda cdim: pl.BlockSpec(
        (cdim, TH, TW), lambda t, c: (0, t // n_tx, t % n_tx)
    )
    in_specs = [
        pl.BlockSpec((None, 9, CH), lambda t, c: (t, 0, c),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, 1, CH), lambda t, c: (t, 0, c),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, 1, 128), lambda t, c: (t, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [fv9, ids, counts]
    if banded:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda t, c: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(jnp.asarray(ty0, jnp.int32).reshape(1, 1))
    in_specs += [tspec(K), tspec(K), tspec(3 * K), tspec(K)]
    args += [idx_k, gz_k, gb_k, gd_k]
    gout = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, 9, CH), lambda t, c: (t, 0, c), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 9, MFT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*args)

    # small scatter: (n_tiles * MFT) slot grads -> (F, 9)
    flat_ids = ids.reshape(-1)
    flat_g = jnp.moveaxis(gout, 1, 2).reshape(-1, 9)
    flat_g = jnp.where((flat_ids >= 0)[:, None], flat_g, 0.0)
    grad = jax.ops.segment_sum(
        flat_g, jnp.maximum(flat_ids, 0), num_segments=F
    )
    return grad.reshape(F, 3, 3)


# --------------------------------------------------------------------------- #
# Fused differentiable rasterization op (forward select + custom backward)
# --------------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def rasterize_fragments_pallas(
    face_verts: jnp.ndarray,  # (F, 3, 3)
    valid: jnp.ndarray,  # (F,)
    image_size: Tuple[int, int],
    blur_radius: float = 0.0,
    faces_per_pixel: int = 1,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    max_faces_per_tile: Optional[int] = None,
):
    """(pix_to_face, zbuf, bary, dists) with Pallas select + Pallas backward.

    zbuf/bary/dists are differentiable wrt face_verts; pix_to_face is not
    (reference rasterize_meshes.py:313 semantics).
    """
    out, _ = _rfp_fwd(
        face_verts, valid, image_size, blur_radius, faces_per_pixel,
        perspective_correct, clip_barycentric_coords, cull_backfaces,
        max_faces_per_tile,
    )
    return out


def _rfp_fwd_impl(
    face_verts, valid, image_size, blur_radius, faces_per_pixel,
    perspective_correct, clip_barycentric_coords, cull_backfaces,
    max_faces_per_tile, ty0=None, n_ty_band=None,
):
    """Shared forward for the full-image and row-band entry points.

    With `ty0`/`n_ty_band` set, rasterizes only the `n_ty_band` tile rows
    starting at (traced) tile row `ty0` of the full `image_size` grid —
    bit-identical to the matching rows of the full rasterization.  Used by
    parallel/raster.py inside shard_map (ty0 = axis_index * band rows).
    """
    H, W = image_size
    K = faces_per_pixel
    F = face_verts.shape[0]
    tile = _tile_for(K, F, H)
    TH, TW = tile
    banded = ty0 is not None
    if banded and H % TH != 0:
        raise ValueError(
            f"row-band rasterization needs image height {H} divisible by"
            f" the tile height {TH}"
        )

    ok = _face_ok(face_verts, valid, cull_backfaces)

    if max_faces_per_tile is None:
        mft = _heuristic_mft(F, image_size, tile)
    else:
        mft = _round_mft(max_faces_per_tile, F)

    fv9, ids, counts, n_ty, n_tx, _ = _bin_faces(
        jax.lax.stop_gradient(face_verts), ok, image_size, blur_radius,
        tile, mft,
        row_band=(ty0, n_ty_band) if banded else None,
    )
    n_tiles = n_ty * n_tx
    MFT = fv9.shape[2]
    CH = min(MFT, _CHUNK)
    n_chunks = MFT // CH

    band_arr = (
        jnp.asarray(ty0, jnp.int32).reshape(1, 1) if banded else None
    )

    def kernel(fv_ref, ids_ref, count_ref, *rest):
        if banded:
            band_ref = rest[0]
            outs = rest[1:]
            ty0_val = band_ref[0, 0]
        else:
            outs = rest
            ty0_val = 0
        idx_o, z_o, b0_o, b1_o, b2_o, d_o = outs
        _fine_kernel(
            fv_ref, ids_ref, count_ref, idx_o, z_o, b0_o, b1_o, b2_o, d_o,
            None,
            emit_fragments=True,
            n_tx=n_tx,
            image_size=image_size,
            blur_radius=float(blur_radius),
            faces_per_pixel=K,
            perspective_correct=perspective_correct,
            clip_barycentric_coords=clip_barycentric_coords,
            tile=tile,
            ty0=ty0_val,
        )

    in_specs = [
        pl.BlockSpec((None, 9, CH), lambda t, c: (t, 0, c),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, 1, CH), lambda t, c: (t, 0, c),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, 1, 128), lambda t, c: (t, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [fv9, ids, counts]
    if banded:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda t, c: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(band_arr)

    out_spec = pl.BlockSpec(
        (K, TH, TW), lambda t, c: (0, t // n_tx, t % n_tx)
    )
    fshape = jax.ShapeDtypeStruct(
        (K, n_ty * TH, n_tx * TW), jnp.float32
    )
    idx_out, z_o, b0_o, b1_o, b2_o, d_o = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=in_specs,
        out_specs=[out_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((K, n_ty * TH, n_tx * TW), jnp.int32),
            fshape, fshape, fshape, fshape, fshape,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*args)

    H_loc = n_ty * TH if banded else H

    def crop(x):
        return jnp.moveaxis(x, 0, -1)[:H_loc, :W]

    pix_to_face = crop(idx_out)
    empty = pix_to_face < 0
    zbuf = jnp.where(empty, -1.0, crop(z_o))
    bary = jnp.where(
        empty[..., None], -1.0,
        jnp.stack([crop(b0_o), crop(b1_o), crop(b2_o)], axis=-1),
    )
    dists = jnp.where(empty, -1.0, crop(d_o))
    out = (pix_to_face, zbuf, bary, dists)
    # F and n_tx are recovered statically in the bwd (from shapes / image
    # size) — residuals must be arrays only.
    band_res = band_arr if banded else jnp.zeros((1, 1), jnp.int32)
    res = (fv9, ids, counts, pix_to_face, jnp.zeros((F, 0), jnp.float32),
           band_res)
    return out, res


def _rfp_fwd(
    face_verts, valid, image_size, blur_radius, faces_per_pixel,
    perspective_correct, clip_barycentric_coords, cull_backfaces,
    max_faces_per_tile,
):
    return _rfp_fwd_impl(
        face_verts, valid, image_size, blur_radius, faces_per_pixel,
        perspective_correct, clip_barycentric_coords, cull_backfaces,
        max_faces_per_tile,
    )


def _rfp_bwd(
    image_size, blur_radius, faces_per_pixel, perspective_correct,
    clip_barycentric_coords, cull_backfaces, max_faces_per_tile, res, g,
):
    fv9, ids, counts, pix_to_face, f_marker, _ = res
    F = f_marker.shape[0]
    n_tx = -(-image_size[1] // _TILE_W)
    _, gz, gbary, gdists = g
    grad_fv = rasterize_grad_pallas(
        fv9, ids, counts, pix_to_face, gz, gbary, gdists, F, image_size,
        faces_per_pixel, perspective_correct, clip_barycentric_coords, n_tx,
    )
    return grad_fv, None


rasterize_fragments_pallas.defvjp(_rfp_fwd, _rfp_bwd)


# --------------------------------------------------------------------------- #
# Row-band entry: the same fused op over a horizontal band of the image.
# ty0 is a TRACED tile-row offset (so shard_map can pass axis_index-derived
# bands); n_ty_band is static.  Outputs cover rows
# [ty0*TH, ty0*TH + n_ty_band*TH) and are bit-identical to those rows of the
# full-image op.
# --------------------------------------------------------------------------- #


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10)
)
def rasterize_fragments_pallas_band(
    face_verts: jnp.ndarray,  # (F, 3, 3)
    valid: jnp.ndarray,  # (F,)
    ty0: jnp.ndarray,  # () int32 — first tile row of the band (traced ok)
    image_size: Tuple[int, int],
    blur_radius: float = 0.0,
    faces_per_pixel: int = 1,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    max_faces_per_tile: Optional[int] = None,
    n_ty_band: int = 1,
):
    out, _ = _rfpb_fwd(
        face_verts, valid, ty0, image_size, blur_radius, faces_per_pixel,
        perspective_correct, clip_barycentric_coords, cull_backfaces,
        max_faces_per_tile, n_ty_band,
    )
    return out


def _rfpb_fwd(
    face_verts, valid, ty0, image_size, blur_radius, faces_per_pixel,
    perspective_correct, clip_barycentric_coords, cull_backfaces,
    max_faces_per_tile, n_ty_band,
):
    return _rfp_fwd_impl(
        face_verts, valid, image_size, blur_radius, faces_per_pixel,
        perspective_correct, clip_barycentric_coords, cull_backfaces,
        max_faces_per_tile, ty0=ty0, n_ty_band=n_ty_band,
    )


def _rfpb_bwd(
    image_size, blur_radius, faces_per_pixel, perspective_correct,
    clip_barycentric_coords, cull_backfaces, max_faces_per_tile, n_ty_band,
    res, g,
):
    fv9, ids, counts, pix_to_face, f_marker, band_arr = res
    F = f_marker.shape[0]
    n_tx = -(-image_size[1] // _TILE_W)
    _, gz, gbary, gdists = g
    grad_fv = rasterize_grad_pallas(
        fv9, ids, counts, pix_to_face, gz, gbary, gdists, F, image_size,
        faces_per_pixel, perspective_correct, clip_barycentric_coords, n_tx,
        ty0=band_arr,
    )
    return grad_fv, None, None


rasterize_fragments_pallas_band.defvjp(_rfpb_fwd, _rfpb_bwd)
