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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....transforms.rotation_conversions import (
    axis_angle_to_matrix,
    rotation_6d_to_matrix,
)
from ..rasterize_points import rasterize_points_topk_xla


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
        O(P log) sort-based binning; must be called on concrete (eager)
        arrays."""
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
        if jax.default_backend() == "tpu":
            from ..rasterize_points_pallas import (
                rasterize_points_fragments_pallas,
                required_points_per_tile,
                required_tiles_per_point,
            )

            mppt = None
            mtpp = None
            if binning_hints is not None:
                # static (max_points_per_tile, (y_tiles, x_tiles)) from
                # the caller — lets JIT-compiled callers select the
                # O(P log) sort-based binning (inside a trace the
                # host-side sizing below is unavailable); compute with
                # required_points_per_tile / required_tiles_per_point
                mppt, mtpp = binning_hints
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
            idx = rasterize_points_fragments_pallas(
                jax.lax.stop_gradient(pts_ndc), r_ndc, valid, (H, W),
                self._n_track, mppt, mtpp,
            )[0]
        else:
            idx = rasterize_points_topk_xla(
                pts_ndc, r_ndc, valid, (H, W), self._n_track
            )  # (H, W, K)
        sel = jnp.maximum(idx, 0)
        hit = idx >= 0

        # differentiable recompute at selected spheres
        from ...mesh.rasterize_meshes import pixel_grid_ndc

        yf, xf = pixel_grid_ndc(H, W, vert_pos.dtype)
        pxy = jnp.stack(jnp.meshgrid(yf, xf, indexing="ij")[::-1], axis=-1)
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
        g = table[sel]  # (H, W, K, 5 + C)
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

        bg_logit = self._bg_norm_depth / gamma
        logit = jnp.where(hit, co * z_norm / gamma, -jnp.inf)
        logit_max = jnp.maximum(
            jnp.max(logit, axis=-1), bg_logit
        )  # include the background logit in the max shift
        w_raw = co * closeness * jnp.exp(logit - logit_max[..., None])
        w_raw = jnp.where(hit, w_raw, 0.0)
        w_bg = jnp.exp(bg_logit - logit_max)
        denom = jnp.sum(w_raw, axis=-1) + w_bg

        if mode == 1:
            # hit map: number of spheres whose silhouette covers the
            # pixel (reference mode=1 "render the hit map", ext.cpp)
            hits = jnp.sum(
                (hit & (closeness > 0.0)).astype(vert_pos.dtype), axis=-1
            )
            return hits[..., None]

        cols = g[..., 5:]  # (H, W, K, C)
        image = (
            jnp.sum(w_raw[..., None] * cols, axis=-2)
            + w_bg[..., None] * bg_col
        ) / denom[..., None]

        if return_forward_info:
            info = {
                "closest_ids": idx,
                "weights": w_raw / denom[..., None],
                "depths": jnp.where(hit, cz, -1.0),
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
