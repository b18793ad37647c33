"""Splatter blending (differentiable surface splatting).

Parity: reference renderer/splatter_blend.py:23-447 (`SplatterBlender`),
used by SplatterPhongShader (shader.py:309) to pair a non-differentiable
rasterization step with differentiable gradients, per "Differentiable
Surface Rendering via Non-Differentiable Sampling" (Cole et al.).

Full pipeline (matching the reference's stages):
  1. Differentiable per-fragment screen positions from barycentrics x
     vertex positions (exactly pixel centers on the forward pass).
  2a. Occlusion-layer linkage: each of the 9 splatting neighbors p of a
     center pixel q is classified as same-surface / foreground /
     background by matching the top rasterization layers by depth
     (reference _compute_occlusion_layers :144).
  2b. Gaussian splat weights per direction, normalized by the kernel sum
     (+epsilon so gradients flow at non-boundary pixels, :127).
  3. Direction-aligned accumulation via zero-padded shifts (no wrap-
     around; the reference pads+crops with torch.gather, :287).
  4. Accumulate into 3 occlusion buffers (background/surface/foreground).
  5. Normalize each buffer by its weight and alpha-composite bg->fg over
     the background color (:400).

TPU notes: everything is elementwise/stack ops on (N, H, W, K, 9) —
XLA fuses the 9-direction loop; no scatter anywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .blending import BlendParams

# the 9 splat displacements in (dy, dx) = (row, col) order
_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[h, w] = x[h + dy, w + dx], zero-padded at borders (axes 1, 2)."""
    H, W = x.shape[1], x.shape[2]
    pad = [(0, 0), (1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 3)
    xp = jnp.pad(x, pad)
    return xp[:, 1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]


def _compute_occlusion_layers(q_depth: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, K) fragment depths -> (N, H, W, 9) int32 occlusion offsets.

    For each direction d, the value is the index of q's rasterization layer
    whose depth matches the top splatting layer coming from d: 0 = same
    surface, >0 = the splat rides above q's surface (foreground), <0 = the
    splat's top layer matches a deeper q layer (background). Mirrors
    reference _compute_occlusion_layers (splatter_blend.py:144).
    """
    # p_depth[..., d, k]: depth of the neighbor in direction d (zero pad)
    p_depth = jnp.stack(
        [_shift2d(q_depth, dy, dx) for (dy, dx) in _OFFSETS], axis=3
    )  # (N, H, W, 9, K)
    q_d = q_depth[:, :, :, None, :]  # (N, H, W, 1, K)

    # closest p-layer to q's top layer
    qtop_to_p = jnp.abs(p_depth - q_d[..., 0:1])  # (N, H, W, 9, K)
    qtop_closest = jnp.min(qtop_to_p, axis=-1)
    qtop_closest_id = jnp.argmin(qtop_to_p, axis=-1)

    # closest q-layer to p's top layer
    ptop_to_q = jnp.abs(p_depth[..., 0:1] - q_d)  # (N, H, W, 9, K)
    ptop_closest = jnp.min(ptop_to_q, axis=-1)
    ptop_closest_id = jnp.argmin(ptop_to_q, axis=-1)

    return jnp.where(
        ptop_closest < qtop_closest,
        -ptop_closest_id,
        qtop_closest_id,
    ).astype(jnp.int32)


def _splat_kernel_normalization(sigma: float) -> float:
    """(1 + eps) / sum_d exp(-|d|^2 / 2 sigma^2) (reference :127-141)."""
    eps = 0.05
    total = sum(
        float(jnp.exp(-(dy * dy + dx * dx) / (2.0 * sigma**2)))
        for (dy, dx) in _OFFSETS
    )
    return (1.0 + eps) / total


class SplatterBlender:
    """Occlusion-aware 9-tap splatting blender (reference :448)."""

    def __init__(self, input_shape: Tuple[int, ...] = (), device=None) -> None:
        pass  # no precomputed state needed: shifts are static slices

    def __call__(
        self,
        colors: jnp.ndarray,  # (N, H, W, K, 4) shaded colors + alpha
        pixel_coords_screen: jnp.ndarray,  # (N, H, W, K, 2 or 3) positions
        fragments,
        blend_params: BlendParams,
    ) -> jnp.ndarray:
        """Splat + occlusion-layered composite to (N, H, W, 4)."""
        N, H, W, K, _ = colors.shape
        sigma = blend_params.sigma if blend_params.sigma else 0.5
        bg_mask = fragments.pix_to_face < 0  # (N, H, W, K)

        # background fragments: alpha 0, colors 0, depth at far plane
        alpha = jnp.where(bg_mask, 0.0, colors[..., 3])
        colors = jnp.where(bg_mask[..., None], 0.0, colors)
        depth = jnp.where(bg_mask, 1.0, fragments.zbuf)

        occlusion = _compute_occlusion_layers(depth)  # (N, H, W, 9)

        # subpixel offset of each splat from its own pixel center: zero at
        # forward; carries the vertex-position gradients. Screen coords use
        # the reference's with_xyflip=False convention (x = -(col + .5),
        # y = -(row + .5) at forward), under which a point moving right by
        # d pixels gives cx = +d and moving down gives cy = +d.
        xy = pixel_coords_screen[..., :2]
        q_to_center = jnp.floor(xy) - xy + 0.5  # (N, H, W, K, 2)
        cx, cy = q_to_center[..., 0], q_to_center[..., 1]

        norm_const = _splat_kernel_normalization(sigma)
        inv2s2 = 1.0 / (2.0 * sigma**2)

        # per-direction splat weights at the SOURCE pixel p for its
        # neighbor q = p + (dy, dx): Gaussian of (q_center - p_position)
        accum = [
            jnp.zeros((N, H, W, K, 5), colors.dtype) for _ in range(3)
        ]  # background / surface / foreground buffers, RGBA + weight
        layer_ids = jnp.arange(K, dtype=jnp.int32)  # (K,)
        for d, (dy, dx) in enumerate(_OFFSETS):
            # splat from p lands on q = p - (dy, dx) (see _shift2d below);
            # the Gaussian distance to q's center is |(cx, cy) + (dx, dy)|
            d2 = (cx + dx) ** 2 + (cy + dy) ** 2
            w = jnp.exp(-d2 * inv2s2) * alpha * norm_const  # (N, H, W, K)
            cw = jnp.concatenate(
                [colors * w[..., None], w[..., None]], axis=-1
            )  # (N, H, W, K, 5) at p
            # align at the splatted pixel: out[q] = cw[p], p = q + (dy, dx)
            cw_at_q = _shift2d(cw, dy, dx)
            occ_d = occlusion[:, :, :, None, d]  # (N, H, W, 1)
            masks = (
                occ_d < layer_ids,  # splat below q's surface: background
                occ_d == layer_ids,  # same surface
                occ_d > layer_ids,  # splat above: foreground
            )
            for i, m in enumerate(masks):
                accum[i] = accum[i] + cw_at_q * m[..., None]

        # sum the K rasterization layers inside each occlusion buffer,
        # normalize by accumulated weight (>= 1 like the reference :423)
        buffers = []
        for i in range(3):
            tot = jnp.sum(accum[i], axis=3)  # (N, H, W, 5)
            scale = 1.0 / jnp.maximum(tot[..., 4:5], 1.0)
            buffers.append(tot[..., :4] * scale)

        bg = jnp.asarray(blend_params.background_color, colors.dtype)
        out = jnp.concatenate([bg, jnp.zeros((1,), colors.dtype)])
        out = jnp.broadcast_to(out, (N, H, W, 4))
        # compose background -> surface -> foreground (reference :434-444)
        for buf in buffers:
            a = buf[..., 3:4]
            out = buf + (1.0 - a) * out
        return out


def pixel_coords_screen_from_fragments(fragments, meshes, cameras, image_size):
    """Differentiable per-fragment screen positions.

    Interpolates WORLD-space vertex positions with the fragment
    barycentrics (with perspective-correct barycentrics the interpolated
    point lies on the ray through the pixel center) and projects with
    ``cameras.transform_points_screen(with_xyflip=False)`` — so forward
    values are exactly (col + .5, row + .5) and vertex gradients flow with
    the correct sign through a detached rasterizer (reference
    splatter_blend.py:74-123 `_get_splat_kernel_normalization` region /
    shading.py:87 `_phong_shading_with_pixels`).
    """
    H, W = image_size
    verts = meshes.verts_padded()  # world space
    N, V, _ = verts.shape
    verts_packed = verts.reshape(-1, 3)
    faces = meshes.faces_packed()
    sel = jnp.maximum(fragments.pix_to_face, 0)
    fv = verts_packed[jnp.maximum(faces, 0)][sel]  # (N, H, W, K, 3, 3)
    # The rasterizer must act DETACHED here: with differentiable
    # barycentrics the interpolated point is pinned to the pixel-center ray
    # and its projection has zero vertex gradient. Detaching bary leaves
    # the gradient path through the vertex positions only, which is the
    # whole point of splatting (Cole et al.; reference shader.py:341).
    bary = jax.lax.stop_gradient(fragments.bary_coords)
    pix_world = jnp.einsum("...k,...kj->...j", bary, fv)  # (N, H, W, K, 3)
    screen = cameras.transform_points_screen(
        pix_world.reshape(N, -1, 3),
        image_size=(H, W),
        with_xyflip=False,
    ).reshape(N, H, W, -1, 3)
    return screen[..., :2]
