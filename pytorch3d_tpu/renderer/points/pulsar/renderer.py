"""Pulsar-style differentiable sphere renderer, TPU-native.

Parity target: reference renderer/points/pulsar/renderer.py:280 backed by
csrc/pulsar/ (7,793 LoC of fused CUDA/CPU kernels).  API (camera parameter
vector layout, gamma/min_depth/max_depth/bg_col semantics, per-sphere
radii/colors/opacities) follows the reference; the implementation is the
TPU architecture: sphere->pixel assignment reuses the tile/top-K selection
machinery of our point rasterizer (ascending-z, K = n_track spheres
tracked per pixel, the analog of pulsar's per-pixel gradient tracking
n_track=5), and blending is the softmax aggregation of the pulsar paper
(arXiv:2004.07484, Eq. 2):

    w_i = o_i d_i exp(o_i z'_i / gamma) / (sum_j o_j d_j exp(o_j z'_j / gamma)
          + exp(eps / gamma))

with z'_i the normalized inverse depth in [0, 1] (closest = 1) and d_i the
normalized in-circle closeness of the pixel ray to the sphere.  Everything
is jnp -> differentiable end to end through XLA (no custom backward).

Camera parameter vector (reference `cam_params`, 8 floats):
    [px, py, pz, rx, ry, rz, focal_length, sensor_width]
with (rx, ry, rz) an axis-angle rotation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....transforms.rotation_conversions import (
    axis_angle_to_matrix,
    rotation_6d_to_matrix,
)
from ..rasterize_points import rasterize_points_topk_xla


# above this many pixels the blend runs in row slabs: the gathered
# (H, W, K, F) buffer lays out with K/F on the tiled minor axes, so XLA
# pads them to (8, 128) — measured 25.6x memory expansion, OOM at 2048^2
# with 1e6 spheres (18.6 G needed of 15.7 G HBM)
_BLEND_CHUNK_PIXELS = 2 * 1024 * 1024


def _blend_core(table, idx, bg_col, gamma, min_depth, max_depth,
                bg_norm_depth, H, W):
    """The pulsar softmax blend over the K selected spheres per pixel.

    Returns (image, denom, logit_max, w_raw, g): the per-pixel blend plus
    the environment the scatter-free backward needs (denom / logit_max)
    and the gathered per-hit fields (for forward info).  Above
    _BLEND_CHUNK_PIXELS the blend maps over row slabs and returns
    (image, denom, logit_max, None, None)."""
    if H * W > _BLEND_CHUNK_PIXELS:
        rows_per = max(_BLEND_CHUNK_PIXELS // W // 8 * 8, 8)
        n_chunks = -(-H // rows_per)
        Hp = n_chunks * rows_per
        idx_p = jnp.pad(
            idx, ((0, Hp - H), (0, 0), (0, 0)), constant_values=-1
        )
        idx_c = idx_p.reshape(n_chunks, rows_per, W, idx.shape[-1])
        row0 = jnp.arange(n_chunks, dtype=jnp.int32) * rows_per

        def one(args):
            idx_i, r0 = args
            img, den, lm, _, _ = _blend_rows(
                table, idx_i, bg_col, gamma, min_depth, max_depth,
                bg_norm_depth, H, W, r0,
            )
            return img, den, lm

        img, den, lm = jax.lax.map(one, (idx_c, row0))
        C = img.shape[-1]
        return (
            img.reshape(Hp, W, C)[:H],
            den.reshape(Hp, W)[:H],
            lm.reshape(Hp, W)[:H],
            None,
            None,
        )
    return _blend_rows(
        table, idx, bg_col, gamma, min_depth, max_depth, bg_norm_depth,
        H, W, 0,
    )


def _blend_rows(table, idx, bg_col, gamma, min_depth, max_depth,
                bg_norm_depth, H, W, row0):
    """The blend over a row slab of the image; `row0` is the slab's
    first image row (for pixel coordinates).  idx is (h, W, K)."""
    sel = jnp.maximum(idx, 0)
    hit = idx >= 0
    from ...mesh.rasterize_meshes import pixel_grid_ndc

    yf, xf = pixel_grid_ndc(H, W, table.dtype)
    h = idx.shape[0]
    if isinstance(row0, int) and row0 == 0 and h == H:
        yf_slab = yf
    else:
        # last slab may read past H: the pad rows carry idx == -1 and
        # contribute nothing
        yf_slab = jax.lax.dynamic_slice_in_dim(
            jnp.pad(yf, (0, h)), row0, h
        )
    pxy = jnp.stack(
        jnp.meshgrid(yf_slab, xf, indexing="ij")[::-1], axis=-1
    )
    g = table[sel]  # (h, W, K, 5 + C)
    cx = g[..., 0]
    cy = g[..., 1]
    cz = g[..., 2]
    cr = g[..., 3]
    co = g[..., 4]
    d2 = (pxy[..., None, 0] - cx) ** 2 + (pxy[..., None, 1] - cy) ** 2
    closeness = jnp.clip(1.0 - d2 / (cr * cr), 0.0, 1.0)  # d_i

    # normalized inverse depth in [0, 1]: 1 at min_depth, 0 at max_depth
    z_norm = 1.0 - (cz - min_depth) / (max_depth - min_depth)
    z_norm = jnp.clip(z_norm, 0.0, 1.0)

    bg_logit = bg_norm_depth / gamma
    logit = jnp.where(hit, co * z_norm / gamma, -jnp.inf)
    logit_max = jnp.maximum(
        jnp.max(logit, axis=-1), bg_logit
    )  # include the background logit in the max shift
    w_raw = co * closeness * jnp.exp(logit - logit_max[..., None])
    w_raw = jnp.where(hit, w_raw, 0.0)
    w_bg = jnp.exp(bg_logit - logit_max)
    denom = jnp.sum(w_raw, axis=-1) + w_bg

    cols = g[..., 5:]  # (H, W, K, C)
    image = (
        jnp.sum(w_raw[..., None] * cols, axis=-2)
        + w_bg[..., None] * bg_col
    ) / denom[..., None]
    return image, denom, logit_max, w_raw, g


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _blend_packed(
    table, bg_col, ids, counts, rows, idx,
    gamma, min_depth, max_depth, bg_norm_depth, image_size, n_tx, tile,
):
    """Pulsar blend with a scatter-free Pallas backward (TPU path).

    The autodiff backward of `table[sel]` is a (H*W*K)-row scatter-add
    into (P, F) — measured 452 ms at 1e6 spheres @1024^2, 3x the whole
    forward.  The custom VJP reduces per-tile with the same chunked SMEM
    kernel shape as the rasterizer's grad kernel over the SAME binning
    the select pass used (ids/counts/rows from bin_points_for_pulsar)
    and combines with a (P, tiles-per-point) row gather
    (rasterize_points_pallas.pulsar_blend_grads)."""
    H, W = image_size
    image, _, _, _, _ = _blend_core(
        table, idx, bg_col, gamma, min_depth, max_depth, bg_norm_depth,
        H, W,
    )
    return image


def _blend_packed_fwd(
    table, bg_col, ids, counts, rows, idx,
    gamma, min_depth, max_depth, bg_norm_depth, image_size, n_tx, tile,
):
    H, W = image_size
    image, denom, logit_max, _, _ = _blend_core(
        table, idx, bg_col, gamma, min_depth, max_depth, bg_norm_depth,
        H, W,
    )
    res = (table, bg_col, ids, counts, rows, idx, image, denom,
           logit_max)
    return image, res


def _blend_packed_bwd(
    gamma, min_depth, max_depth, bg_norm_depth, image_size, n_tx, tile,
    res, ct,
):
    from ..rasterize_points_pallas import pulsar_blend_grads

    (table, bg_col, ids, counts, rows, idx, image, denom,
     logit_max) = res
    dtable = pulsar_blend_grads(
        table, ids, counts, rows, idx, ct, image, denom, logit_max,
        image_size, gamma, min_depth, max_depth, n_tx, tile,
    )
    # d(bg_col): dI_c/dbg_c = w_bg / denom per pixel (w_bg independent
    # of every sphere field and of bg itself)
    w_bg = jnp.exp(bg_norm_depth / gamma - logit_max)
    dbg = jnp.sum(ct * (w_bg / denom)[..., None], axis=(0, 1))
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (
        dtable,
        dbg.astype(bg_col.dtype),
        zero(ids),
        zero(counts),
        zero(rows),
        zero(idx),
    )


_blend_packed.defvjp(_blend_packed_fwd, _blend_packed_bwd)


class Renderer:
    """Pulsar renderer (reference pulsar/renderer.py:280)."""

    def __init__(
        self,
        width: int,
        height: int,
        max_num_balls: int,
        orthogonal_projection: bool = False,
        right_handed_system: bool = False,
        background_normalized_depth: float = 0.0,
        n_channels: int = 3,
        n_track: int = 5,
    ) -> None:
        self._width = width
        self._height = height
        self._max_num_balls = max_num_balls
        self._orthogonal = orthogonal_projection
        self._right_handed = right_handed_system
        self._bg_norm_depth = background_normalized_depth
        self._n_channels = n_channels
        self._n_track = n_track

    @staticmethod
    def _parse_cam(cam_params: jnp.ndarray):
        """Parse the reference's {8, 10, 11, 13}-float camera layouts
        (reference renderer.py:390-477): axis-angle rotation at 8/10
        floats, Zhou et al. 6D rotation at 11/13; optional trailing
        principal-point offsets."""
        n = cam_params.shape[0]
        if n in (11, 13):
            rot = rotation_6d_to_matrix(cam_params[3:9])
            focal = cam_params[9]
            sensor_width = cam_params[10]
            pp = cam_params[11:13] if n == 13 else None
        else:
            rot = axis_angle_to_matrix(cam_params[3:6])
            focal = cam_params[6]
            sensor_width = cam_params[7]
            pp = cam_params[8:10] if n == 10 else None
        return cam_params[0:3], rot, focal, sensor_width, pp

    def _cam_to_view(self, vert_pos: jnp.ndarray, pos, rot):
        rel = vert_pos - pos[None]
        view = rel @ rot  # row-vector application of R^T ... see docstring
        if self._right_handed:
            view = view.at[:, 2].multiply(-1.0)
        return view

    def _project_ndc(self, vert_pos, vert_rad, cam_params, min_depth,
                     max_depth):
        """Camera projection shared by forward() and
        compute_binning_hints(): sphere centers/radii in PyTorch3D NDC
        plus the validity mask."""
        H, W = self._height, self._width
        cam_pos, cam_rot, focal, sensor_width, pp = self._parse_cam(
            cam_params
        )
        view = self._cam_to_view(vert_pos, cam_pos, cam_rot)
        z = view[:, 2]
        if self._orthogonal:
            scale = 2.0 / sensor_width
            x_ndc = view[:, 0] * scale
            y_ndc = view[:, 1] * scale
            r_ndc = vert_rad * scale
        else:
            # perspective: NDC x = f * X/Z / (sensor/2)
            inv_z = 1.0 / jnp.clip(z, 1e-6)
            scale = focal / (sensor_width / 2.0)
            x_ndc = view[:, 0] * inv_z * scale
            y_ndc = view[:, 1] * inv_z * scale
            r_ndc = vert_rad * inv_z * scale

        # principal-point offsets in pixels (10/13-float layouts,
        # reference unified.py:502)
        if pp is not None:
            x_ndc = x_ndc + pp[0] / (0.5 * W)
            y_ndc = y_ndc + pp[1] / (0.5 * H)

        # pulsar's image +x is RIGHT; the shared point rasterizer and the
        # closeness recompute below use PyTorch3D NDC (+x LEFT) -> negate
        # x once here (verified against the reference multiview goldens,
        # which are otherwise mirrored)
        x_ndc = -x_ndc
        pts_ndc = jnp.stack([x_ndc, y_ndc, z], axis=-1)
        valid = (z > min_depth) & (z < max_depth)
        return pts_ndc, r_ndc, valid, x_ndc, y_ndc, z

    def compute_binning_hints(
        self,
        vert_pos: jnp.ndarray,
        vert_rad: jnp.ndarray,
        cam_params: jnp.ndarray,
        max_depth: float,
        min_depth: float = 0.0,
    ) -> tuple:
        """Host-side static binning sizes for this scene/camera —
        (max_points_per_tile, (y_tiles, x_tiles)).  Pass the result as
        forward(..., binning_hints=...) so JIT-compiled renders use the
        O(P log) sort-based binning (and, with grads, the scatter-free
        blend backward over the same binning); must be called on
        concrete (eager) arrays."""
        from ..rasterize_points_pallas import (
            required_points_per_tile,
            required_tiles_per_point,
        )

        pts_ndc, r_ndc, valid, _, _, _ = self._project_ndc(
            vert_pos, vert_rad, cam_params, min_depth, max_depth
        )
        H, W = self._height, self._width
        need = int(
            required_points_per_tile(pts_ndc, r_ndc, valid, (H, W))
        )
        mppt = 1 << max(need - 1, 0).bit_length()
        t = required_tiles_per_point(pts_ndc, r_ndc, valid, (H, W))
        return mppt, (max(int(t[0]), 1), max(int(t[1]), 1))

    def forward(
        self,
        vert_pos: jnp.ndarray,  # (P, 3)
        vert_col: jnp.ndarray,  # (P, C)
        vert_rad: jnp.ndarray,  # (P,)
        cam_params: jnp.ndarray,  # (8,)
        gamma: float,
        max_depth: float,
        min_depth: float = 0.0,
        bg_col: Optional[jnp.ndarray] = None,
        opacity: Optional[jnp.ndarray] = None,  # (P,)
        percent_allowed_difference: float = 0.01,
        max_n_hits: Optional[int] = None,
        mode: int = 0,
        return_forward_info: bool = False,
        binning_hints: Optional[tuple] = None,
    ):
        """Render spheres to an (H, W, C) image (reference `_Render`)."""
        H, W = self._height, self._width
        C = self._n_channels
        P = vert_pos.shape[0]
        cam_pos, cam_rot, focal, sensor_width, pp = self._parse_cam(
            cam_params
        )
        if bg_col is None:
            # reference renderer.py:71: None means all ones
            bg_col = jnp.ones((C,), vert_col.dtype)
        if opacity is None:
            opacity = jnp.ones((P,), vert_pos.dtype)

        pts_ndc, r_ndc, valid, x_ndc, y_ndc, z = self._project_ndc(
            vert_pos, vert_rad, cam_params, min_depth, max_depth
        )

        # Sphere -> pixel assignment.  On TPU the tile-binned Pallas point
        # kernel runs (chunk-streamed per-tile lists; this is what lets
        # pulsar reach the reference's millions-of-spheres regime,
        # csrc/pulsar/gpu/renderer.*.gpu.cu); elsewhere the XLA oracle.
        shared_binning = None
        if jax.default_backend() == "tpu":
            from ..rasterize_points_pallas import (
                _tile_for_k,
                bin_points_for_pulsar,
                rasterize_points_fragments_pallas,
                required_points_per_tile,
                required_tiles_per_point,
                select_from_binned,
            )

            mppt = None
            mtpp = None
            if binning_hints is not None:
                # static (max_points_per_tile, (y_tiles, x_tiles), ...)
                # from the caller — lets JIT-compiled callers select the
                # O(P log) sort-based binning (inside a trace the
                # host-side sizing below is unavailable); compute with
                # compute_binning_hints
                mppt, mtpp = binning_hints[:2]
            elif not isinstance(pts_ndc, jax.core.Tracer):
                need = int(
                    required_points_per_tile(
                        jax.lax.stop_gradient(pts_ndc), r_ndc, valid,
                        (H, W),
                    )
                )
                mppt = 1 << max(need - 1, 0).bit_length()
                # static tiles-per-point bound -> O(P log) sort-based
                # binning (the top_k binning dominated at P ~ 1e6)
                t = required_tiles_per_point(
                    jax.lax.stop_gradient(pts_ndc), r_ndc, valid, (H, W)
                )
                mtpp = (max(int(t[0]), 1), max(int(t[1]), 1))
            if mppt is not None and mtpp is not None:
                # ONE binning serves the select pass AND the blend
                # backward (ids/counts/rows are custom-VJP residuals)
                tile = _tile_for_k(self._n_track)
                data, ids, counts, rows, n_ty, n_tx = (
                    bin_points_for_pulsar(
                        jax.lax.stop_gradient(pts_ndc),
                        jax.lax.stop_gradient(r_ndc), valid,
                        (H, W), mppt, mtpp, tile,
                    )
                )
                idx = select_from_binned(
                    data, ids, counts, (H, W), self._n_track, n_tx, tile
                )
                shared_binning = (ids, counts, rows, n_tx, tile)
            else:
                idx = rasterize_points_fragments_pallas(
                    jax.lax.stop_gradient(pts_ndc), r_ndc, valid, (H, W),
                    self._n_track, mppt, mtpp,
                )[0]
        else:
            idx = rasterize_points_topk_xla(
                pts_ndc, r_ndc, valid, (H, W), self._n_track
            )  # (H, W, K)
        hit = idx >= 0

        # ONE row-gather of all per-sphere fields: eight scalar gathers
        # of (H, W, K) from P-row arrays were ~70% of the 1e6-sphere
        # forward (random single-float loads waste the cache line); a
        # packed (P, 5+C) table turns them into one contiguous-row fetch
        table = jnp.concatenate(
            [
                x_ndc[:, None],
                y_ndc[:, None],
                z[:, None],
                jnp.clip(r_ndc, 1e-8)[:, None],
                opacity[:, None],
                vert_col,
            ],
            axis=-1,
        )

        if mode == 1:
            # hit map: number of spheres whose silhouette covers the
            # pixel (reference mode=1 "render the hit map", ext.cpp)
            if H * W > _BLEND_CHUNK_PIXELS:
                raise NotImplementedError(
                    "mode=1 hit maps above 2M pixels are not chunked yet"
                )
            _, _, _, w_raw, g = _blend_core(
                table, idx, bg_col, gamma, min_depth, max_depth,
                self._bg_norm_depth, H, W,
            )
            from ...mesh.rasterize_meshes import pixel_grid_ndc

            yf, xf = pixel_grid_ndc(H, W, vert_pos.dtype)
            pxy = jnp.stack(
                jnp.meshgrid(yf, xf, indexing="ij")[::-1], axis=-1
            )
            d2 = (pxy[..., None, 0] - g[..., 0]) ** 2 + (
                pxy[..., None, 1] - g[..., 1]
            ) ** 2
            closeness = 1.0 - d2 / (g[..., 3] * g[..., 3])
            hits = jnp.sum(
                (hit & (closeness > 0.0)).astype(vert_pos.dtype), axis=-1
            )
            return hits[..., None]

        if shared_binning is not None:
            ids, counts, rows, n_tx, tile = shared_binning
            # scatter-free custom backward (see _blend_packed)
            image = _blend_packed(
                table, bg_col, ids, counts, rows, idx,
                gamma, min_depth, max_depth, self._bg_norm_depth,
                (H, W), n_tx, tile,
            )
            if return_forward_info:
                _, denom, _, w_raw, g = _blend_core(
                    jax.lax.stop_gradient(table), idx, bg_col, gamma,
                    min_depth, max_depth, self._bg_norm_depth, H, W,
                )
                info = {
                    "closest_ids": idx,
                    "weights": w_raw / denom[..., None],
                    "depths": jnp.where(hit, g[..., 2], -1.0),
                }
                return image, info
            return image

        image, denom, _, w_raw, g = _blend_core(
            table, idx, bg_col, gamma, min_depth, max_depth,
            self._bg_norm_depth, H, W,
        )
        if return_forward_info:
            info = {
                "closest_ids": idx,
                "weights": w_raw / denom[..., None],
                "depths": jnp.where(hit, g[..., 2], -1.0),
            }
            return image, info
        return image

    __call__ = forward

    @staticmethod
    def sphere_ids_from_result_info_nograd(info) -> jnp.ndarray:
        """IDs of the spheres hit per pixel (reference ext.cpp:176)."""
        return info["closest_ids"]

    @staticmethod
    def depth_map_from_result_info_nograd(info) -> jnp.ndarray:
        return info["depths"][..., 0]
