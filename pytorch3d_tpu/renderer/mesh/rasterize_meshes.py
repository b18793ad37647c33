"""Differentiable mesh rasterization, TPU-native design.

Parity target: reference renderer/mesh/rasterize_meshes.py:32 +
csrc/rasterize_meshes/ (semantics of `CheckPixelInsideFace`,
rasterize_meshes.cu:109) and csrc/utils/geometry_utils.cuh barycentric /
point-triangle-distance math.

Architecture (different from the CUDA coarse/fine + atomic-backward design):

1. **Selection pass** (non-differentiable): for every pixel find the K
   nearest-in-z faces whose blur region covers it.  Implemented as a
   `lax.scan` over face chunks with a per-pixel running top-K buffer —
   static shapes, no atomics, no bins (XLA path), with a Pallas tile kernel
   for large face counts (kernels/rasterize_pallas.py).
2. **Recompute pass** (differentiable): gather the selected faces' verts and
   recompute barycentrics / z / signed distance with plain jnp.  Gradients
   to vertices flow through the gather transpose (an XLA scatter-add) —
   replacing the reference's hand-written atomicAdd backward kernel
   (rasterize_meshes.cu:433) with numerically identical math.

`pix_to_face` is integer output (non-differentiable, as in the reference);
zbuf / bary_coords / dists are differentiable.

Conventions: face verts are in NDC xy (+X left, +Y up) with **view-space z**;
pixel (0, 0) is the top-left of the image; dists are *squared* NDC distances,
negative inside the face; blur_radius is in squared NDC units.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

kEpsilon = 1e-8
# Export-time default matches reference rasterize_meshes.py kMaxFacesPerBin.


def non_square_ndc_range(S1: int, S2: int) -> float:
    """NDC span of an image side of length S1 given the other side S2."""
    return 2.0 * max(S1 / S2, 1.0)


def pix_to_non_square_ndc(i: jnp.ndarray, S1: int, S2: int) -> jnp.ndarray:
    """Center of pixel i along a side of length S1 (other side S2)."""
    rng = non_square_ndc_range(S1, S2)
    offset = rng / 2.0
    return -offset + (rng * i + offset) / S1


def pixel_grid_ndc(H: int, W: int, dtype=jnp.float32):
    """(H,) y and (W,) x NDC pixel-center coordinates, row 0 = top (+y)."""
    rows = jnp.arange(H, dtype=dtype)
    cols = jnp.arange(W, dtype=dtype)
    yf = pix_to_non_square_ndc(H - 1 - rows, H, W)
    xf = pix_to_non_square_ndc(W - 1 - cols, W, H)
    return yf, xf


# --------------------------------------------------------------------------- #
# Geometry primitives (math parity with geometry_utils.cuh)
# --------------------------------------------------------------------------- #


def edge_function(p, v0, v1):
    """Signed parallelogram area of (v0, v1, p); all inputs (..., 2)."""
    return (p[..., 0] - v0[..., 0]) * (v1[..., 1] - v0[..., 1]) - (
        p[..., 1] - v0[..., 1]
    ) * (v1[..., 0] - v0[..., 0])


def barycentric_coords(p, v0, v1, v2):
    """Barycentrics of p in triangle (v0, v1, v2); inputs broadcast (..., 2)."""
    area = edge_function(v2, v0, v1) + kEpsilon
    w0 = edge_function(p, v1, v2) / area
    w1 = edge_function(p, v2, v0) / area
    w2 = edge_function(p, v0, v1) / area
    return jnp.stack([w0, w1, w2], axis=-1)


def barycentric_perspective_correction(bary, z0, z1, z2):
    w0_top = bary[..., 0] * z1 * z2
    w1_top = z0 * bary[..., 1] * z2
    w2_top = z0 * z1 * bary[..., 2]
    denom = jnp.maximum(w0_top + w1_top + w2_top, kEpsilon)
    return jnp.stack([w0_top, w1_top, w2_top], axis=-1) / denom[..., None]


def barycentric_clip(bary):
    w = jnp.maximum(bary, 0.0)
    w_sum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-5)
    return w / w_sum


def point_line_segment_distance2(p, v0, v1):
    """Squared distance from p to segment (v0, v1); inputs (..., 2)."""
    v1v0 = v1 - v0
    l2 = jnp.sum(v1v0 * v1v0, axis=-1)
    t = jnp.sum(v1v0 * (p - v0), axis=-1) / jnp.maximum(l2, kEpsilon)
    t = jnp.clip(t, 0.0, 1.0)
    # Degenerate segment: distance to v1 (matches reference behavior).
    t = jnp.where(l2 <= kEpsilon, 1.0, t)
    proj = v0 + t[..., None] * v1v0
    d = p - proj
    return jnp.sum(d * d, axis=-1)


def point_triangle_distance2(p, v0, v1, v2):
    """Squared distance from p to the triangle boundary (min over edges)."""
    e01 = point_line_segment_distance2(p, v0, v1)
    e02 = point_line_segment_distance2(p, v0, v2)
    e12 = point_line_segment_distance2(p, v1, v2)
    return jnp.minimum(jnp.minimum(e01, e02), e12)


# --------------------------------------------------------------------------- #
# Selection pass: per-pixel top-K face ids (non-differentiable)
# --------------------------------------------------------------------------- #


def _face_pixel_candidates(
    fv: jnp.ndarray,  # (C, 3, 3) chunk of face verts
    face_ok: jnp.ndarray,  # (C,) bool (valid & not culled)
    pxy: jnp.ndarray,  # (H, W, 2)
    blur_radius: float,
    perspective_correct: bool,
    clip_barycentric_coords: bool,
):
    """z of each chunk face at each pixel, +inf where face doesn't cover.

    Returns pz (H, W, C) with +inf for non-covering (pixel, face) pairs.
    """
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
    v0xy, v1xy, v2xy = v0[:, :2], v1[:, :2], v2[:, :2]
    z0, z1, z2 = v0[:, 2], v1[:, 2], v2[:, 2]

    p = pxy[:, :, None, :]  # (H, W, 1, 2)
    bary0 = barycentric_coords(p, v0xy, v1xy, v2xy)  # (H, W, C, 3)
    bary = (
        barycentric_perspective_correction(bary0, z0, z1, z2)
        if perspective_correct
        else bary0
    )
    bary_clip = barycentric_clip(bary) if clip_barycentric_coords else bary

    pz = (
        bary_clip[..., 0] * z0 + bary_clip[..., 1] * z1 + bary_clip[..., 2] * z2
    )  # (H, W, C)

    dist2 = point_triangle_distance2(p, v0xy, v1xy, v2xy)  # (H, W, C)
    inside = jnp.all(bary > 0.0, axis=-1)

    covers = face_ok & (pz >= 0) & (inside | (dist2 < blur_radius))
    return jnp.where(covers, pz, jnp.inf)


def _face_culls(
    fv: jnp.ndarray, valid: jnp.ndarray, cull_backfaces: bool
) -> jnp.ndarray:
    """Per-face cull mask shared by all pixels (zmax, area, backface)."""
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
    zmax = jnp.maximum(jnp.maximum(v0[:, 2], v1[:, 2]), v2[:, 2])
    face_area = edge_function(v0[:, :2], v1[:, :2], v2[:, :2])
    zero_area = (face_area <= kEpsilon) & (face_area >= -kEpsilon)
    ok = valid & (zmax >= 0) & ~zero_area
    if cull_backfaces:
        ok = ok & (face_area >= 0)
    return ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size",
        "faces_per_pixel",
        "perspective_correct",
        "clip_barycentric_coords",
        "cull_backfaces",
        "chunk_size",
    ),
)
def rasterize_topk_xla(
    face_verts: jnp.ndarray,  # (F, 3, 3) one image's faces (NDC xy, view z)
    valid: jnp.ndarray,  # (F,) bool
    image_size: Tuple[int, int],
    blur_radius: float = 0.0,
    faces_per_pixel: int = 1,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    chunk_size: int = 256,
) -> jnp.ndarray:
    """Per-pixel ascending-z top-K face indices; -1 where fewer than K cover.

    Pure XLA selection pass: scans over face chunks keeping a (H, W, K)
    running buffer of the smallest-z candidates, merged by sort each step.
    """
    H, W = image_size
    yf, xf = pixel_grid_ndc(H, W, face_verts.dtype)
    pxy = jnp.stack(jnp.meshgrid(yf, xf, indexing="ij")[::-1], axis=-1)  # (H,W,2) xy
    return rasterize_topk_xla_at_pixels(
        face_verts, valid, pxy, blur_radius, faces_per_pixel,
        perspective_correct, clip_barycentric_coords, cull_backfaces,
        chunk_size,
    )


def rasterize_topk_xla_at_pixels(
    face_verts: jnp.ndarray,  # (F, 3, 3)
    valid: jnp.ndarray,  # (F,)
    pxy: jnp.ndarray,  # (H, W, 2) explicit NDC pixel centers (e.g. a
    # row band of a larger image under shard_map pixel sharding)
    blur_radius: float = 0.0,
    faces_per_pixel: int = 1,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    chunk_size: int = 256,
) -> jnp.ndarray:
    """Selection pass over an EXPLICIT pixel grid: per-pixel results are
    independent, so any row/tile partition of `pxy` yields exactly the
    full-image values (the basis of the shard_map sharded rasterizer in
    parallel/raster.py)."""
    H, W = pxy.shape[:2]
    F = face_verts.shape[0]
    K = faces_per_pixel
    C = min(chunk_size, F)
    n_chunks = -(-F // C)
    pad = n_chunks * C - F
    fv = jnp.pad(face_verts, ((0, pad), (0, 0), (0, 0)))
    ok = _face_culls(fv, jnp.pad(valid, (0, pad)), cull_backfaces)

    fv_chunks = fv.reshape(n_chunks, C, 3, 3)
    ok_chunks = ok.reshape(n_chunks, C)

    init_z = jnp.full((H, W, K), jnp.inf, face_verts.dtype)
    init_idx = jnp.full((H, W, K), -1, jnp.int32)

    Kc = min(K, C)

    def step(carry, chunk):
        best_z, best_idx = carry
        fvc, okc, base = chunk
        pz = _face_pixel_candidates(
            fvc, okc, pxy, blur_radius, perspective_correct, clip_barycentric_coords
        )  # (H, W, C)
        # Chunk-local K smallest z (bounded memory: top_k over C, then a
        # 2K-wide merge — never a full (K + C) sort per pixel).
        neg_z, local = jax.lax.top_k(-pz, Kc)
        chunk_z = -neg_z
        chunk_idx = jnp.where(jnp.isinf(chunk_z), -1, base + local.astype(jnp.int32))
        all_z = jnp.concatenate([best_z, chunk_z], axis=-1)
        all_idx = jnp.concatenate([best_idx, chunk_idx], axis=-1)
        # K smallest z; ties broken toward earlier entries (stable sort).
        order = jnp.argsort(all_z, axis=-1, stable=True)[..., :K]
        new_z = jnp.take_along_axis(all_z, order, axis=-1)
        new_idx = jnp.take_along_axis(all_idx, order, axis=-1)
        return (new_z, new_idx), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * C
    (zbuf, idx), _ = jax.lax.scan(
        step, (init_z, init_idx), (fv_chunks, ok_chunks, bases)
    )
    return idx


# --------------------------------------------------------------------------- #
# Recompute pass: differentiable fragment quantities at fixed pix_to_face
# --------------------------------------------------------------------------- #


def _fragments_from_gathered(
    fv: jnp.ndarray,  # (H, W, K, 3, 3) per-pixel gathered face verts
    pix_to_face: jnp.ndarray,  # (H, W, K)
    image_size: Tuple[int, int],
    perspective_correct: bool,
    clip_barycentric_coords: bool,
    pxy=None,
):
    """Elementwise fragment math given already-gathered face verts."""
    v0, v1, v2 = fv[..., 0, :], fv[..., 1, :], fv[..., 2, :]
    v0xy, v1xy, v2xy = v0[..., :2], v1[..., :2], v2[..., :2]
    z0, z1, z2 = v0[..., 2], v1[..., 2], v2[..., 2]

    if pxy is None:
        H, W = image_size
        yf, xf = pixel_grid_ndc(H, W, fv.dtype)
        pxy = jnp.stack(jnp.meshgrid(yf, xf, indexing="ij")[::-1], axis=-1)
    p = pxy[:, :, None, :]  # (H, W, 1, 2)

    bary0 = barycentric_coords(p, v0xy, v1xy, v2xy)
    bary = (
        barycentric_perspective_correction(bary0, z0, z1, z2)
        if perspective_correct
        else bary0
    )
    bary_clip = barycentric_clip(bary) if clip_barycentric_coords else bary
    pz = bary_clip[..., 0] * z0 + bary_clip[..., 1] * z1 + bary_clip[..., 2] * z2

    dist2 = point_triangle_distance2(p, v0xy, v1xy, v2xy)
    inside = jnp.all(bary > 0.0, axis=-1)
    signed_dist = jnp.where(inside, -dist2, dist2)

    empty = pix_to_face < 0
    zbuf = jnp.where(empty, -1.0, pz)
    bary_out = jnp.where(empty[..., None], -1.0, bary_clip)
    dists = jnp.where(empty, -1.0, signed_dist)
    return zbuf, bary_out, dists


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def interpolate_fragments(
    face_verts: jnp.ndarray,  # (F, 3, 3) differentiable
    pix_to_face: jnp.ndarray,  # (H, W, K) int, -1 = empty
    image_size: Tuple[int, int],
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiably recompute (zbuf, bary_coords, dists) for selected faces.

    Matches the quantities produced by the reference fine kernel at the same
    pix_to_face: zbuf from (possibly clipped, possibly perspective-corrected)
    barycentrics; dists signed squared distance.  Empty slots get
    zbuf = -1, bary = -1, dists = -1 (reference fill values).

    Custom VJP: the forward gathers face verts per pixel once and saves them;
    the backward differentiates only the elementwise fragment math and
    performs one scatter-add back to (F, 3, 3) — replacing the reference's
    atomicAdd backward kernel (rasterize_meshes.cu:433) and avoiding XLA's
    default re-gather-heavy transpose.
    """
    sel = jnp.maximum(pix_to_face, 0)
    fv = face_verts[sel]  # (H, W, K, 3, 3)
    return _fragments_from_gathered(
        fv, pix_to_face, image_size, perspective_correct,
        clip_barycentric_coords,
    )


def _interp_fwd(face_verts, pix_to_face, image_size, perspective_correct,
                clip_barycentric_coords):
    sel = jnp.maximum(pix_to_face, 0)
    fv = face_verts[sel]
    out = _fragments_from_gathered(
        fv, pix_to_face, image_size, perspective_correct,
        clip_barycentric_coords,
    )
    return out, (fv, pix_to_face, face_verts.shape[0])


def _interp_bwd(image_size, perspective_correct, clip_barycentric_coords,
                res, g):
    fv, pix_to_face, F = res
    _, pullback = jax.vjp(
        lambda x: _fragments_from_gathered(
            x, pix_to_face, image_size, perspective_correct,
            clip_barycentric_coords,
        ),
        fv,
    )
    (gfv,) = pullback(g)  # (H, W, K, 3, 3)
    gfv = jnp.where((pix_to_face >= 0)[..., None, None], gfv, 0.0)
    # Scatter-add back to faces via the TRANSPOSE of a gather: XLA lowers
    # gather transposes far better than an explicit .at[].add on TPU
    # (measured 75x at 512^2 K=8).
    sel = jnp.maximum(pix_to_face, 0)
    _, gather_pull = jax.vjp(
        lambda f: f[sel], jnp.zeros((F, 3, 3), gfv.dtype)
    )
    (grad_face_verts,) = gather_pull(gfv)
    return grad_face_verts, None


interpolate_fragments.defvjp(_interp_fwd, _interp_bwd)


# --------------------------------------------------------------------------- #
# Public entry (operates on batched padded face verts)
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=1)
def _supports_host_callbacks() -> bool:
    """The axon_pjrt tunnel runtime rejects jax io/debug callbacks."""
    try:
        pv = jax.devices()[0].client.platform_version
    except Exception:
        return True
    return "axon" not in str(pv)


def rasterize_meshes(
    meshes,
    image_size: Union[int, Tuple[int, int]] = 256,
    blur_radius: float = 0.0,
    faces_per_pixel: int = 8,
    bin_size: Optional[int] = None,
    max_faces_per_bin: Optional[int] = None,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    z_clip_value: Optional[float] = None,
    cull_to_frustum: bool = False,
):
    """Rasterize a batch of meshes already in NDC-xy / view-z space.

    Returns (pix_to_face, zbuf, bary_coords, dists) with shapes
    (N, H, W, K), (N, H, W, K), (N, H, W, K, 3), (N, H, W, K).
    `pix_to_face` holds *packed* face indices (mesh n's faces live at
    rows [n*F, (n+1)*F)), or -1.

    bin_size / max_faces_per_bin are accepted for API parity; the TPU
    implementation selects between the XLA scan path and the Pallas tile
    kernel automatically.
    """
    if isinstance(image_size, int):
        image_size = (image_size, image_size)
    H, W = image_size
    # reference rasterize_meshes.py parse_image_size semantics
    if not (isinstance(H, int) and isinstance(W, int) and H > 0 and W > 0):
        raise ValueError(
            f"image_size must be positive ints, got {image_size!r}"
        )

    verts_packed = meshes.verts_packed()
    faces_packed = meshes.faces_packed()
    face_mask = meshes.faces_packed_mask()
    N = len(meshes)
    F = meshes.max_faces

    face_verts = verts_packed[faces_packed]  # (N*F, 3, 3)
    fv_batched = face_verts.reshape(N, F, 3, 3)
    mask_batched = face_mask.reshape(N, F)

    # Near-plane clipping (reference clip.py cases 1-4): each face maps to
    # two static sub-face slots; ids/barycentrics are converted back after
    # rasterization.
    clipped = None
    if z_clip_value is not None:
        from .clip import clip_faces

        clipped = jax.vmap(
            lambda fv1, m1: clip_faces(fv1, m1, z_clip_value)
        )(fv_batched, mask_batched)
        fv_batched = clipped.face_verts  # (N, 2F, 3, 3)
        mask_batched = clipped.valid

    # Backend: fused Pallas select+grad op on TPU (bin_size=0 forces the
    # naive XLA scan, mirroring the reference's bin_size=0 escape hatch).
    use_pallas = jax.default_backend() == "tpu" and bin_size != 0
    if use_pallas:
        from .rasterize_pallas import (
            rasterize_fragments_pallas,
            required_faces_per_tile,
        )

        mft = max_faces_per_bin
        exact_sized = False
        if mft is None and not isinstance(fv_batched, jax.core.Tracer):
            exact_sized = True
            # Eager path: size the per-tile face lists to the exact batch
            # maximum so the binning never drops a face (the CUDA path
            # warns-and-drops at kMaxFacesPerBin instead,
            # rasterize_coarse.cu:192-199).  Bucketed to powers of two to
            # bound recompilation.
            from .rasterize_pallas import _tile_for

            kernel_tile = _tile_for(
                faces_per_pixel, fv_batched.shape[1], H
            )
            need = jax.vmap(
                lambda v, m: required_faces_per_tile(
                    v, m, (H, W), blur_radius, tile=kernel_tile
                )
            )(fv_batched, mask_batched)
            need = max(int(jnp.max(need)), 1)
            mft = 1 << (need - 1).bit_length()

        def one(fv1, m1):
            return rasterize_fragments_pallas(
                fv1,
                m1,
                (H, W),
                blur_radius,
                faces_per_pixel,
                perspective_correct,
                clip_barycentric_coords,
                cull_backfaces,
                mft,
            )

        pix_local, zbuf, bary, dists = jax.vmap(one)(fv_batched, mask_batched)

        if not exact_sized and _supports_host_callbacks():
            # Heuristic-capacity path (jit or explicit max_faces_per_bin):
            # detect + warn on overflow drops like the CUDA coarse kernel
            # (rasterize_coarse.cu:192-199), async via debug.callback.
            # (Skipped on runtimes without host callbacks, e.g. axon_pjrt;
            # callers there can probe required_faces_per_tile eagerly.)
            from .rasterize_pallas import (
                _round_mft,
                _tile_for,
                required_faces_per_tile,
            )

            eff = _round_mft(
                mft if mft is not None else max(1024, F // 4), fv_batched.shape[1]
            )
            kernel_tile = _tile_for(faces_per_pixel, fv_batched.shape[1], H)
            need = jnp.max(
                jax.vmap(
                    lambda v, m: required_faces_per_tile(
                        v, m, (H, W), blur_radius, tile=kernel_tile
                    )
                )(fv_batched, mask_batched)
            )

            def _warn(n_need, n_cap):
                import warnings

                warnings.warn(
                    f"rasterize_meshes: a tile needs {int(n_need)} face slots"
                    f" but capacity is {int(n_cap)}; faces were dropped."
                    " Pass a larger max_faces_per_bin (or call eagerly for"
                    " exact sizing).",
                    RuntimeWarning,
                    stacklevel=2,
                )

            jax.lax.cond(
                need > eff,
                lambda: jax.debug.callback(_warn, need, eff),
                lambda: None,
            )
    else:
        select = functools.partial(
            rasterize_topk_xla,
            image_size=(H, W),
            blur_radius=blur_radius,
            faces_per_pixel=faces_per_pixel,
            perspective_correct=perspective_correct,
            clip_barycentric_coords=clip_barycentric_coords,
            cull_backfaces=cull_backfaces,
        )
        # Selection is integer-valued: block gradients through it.
        pix_local = jax.vmap(select)(
            jax.lax.stop_gradient(fv_batched), mask_batched
        )  # (N, H, W, K) with per-image face ids
        interp = functools.partial(
            interpolate_fragments,
            image_size=(H, W),
            perspective_correct=perspective_correct,
            clip_barycentric_coords=clip_barycentric_coords,
        )
        zbuf, bary, dists = jax.vmap(interp)(fv_batched, pix_local)

    if clipped is not None:
        from .clip import convert_clipped_rasterization_to_original_faces

        pix_local, bary = jax.vmap(
            convert_clipped_rasterization_to_original_faces
        )(pix_local, bary, clipped)

    # Convert to packed ids.
    offsets = (jnp.arange(N, dtype=jnp.int32) * F)[:, None, None, None]
    pix_to_face = jnp.where(pix_local >= 0, pix_local + offsets, -1)
    return pix_to_face, zbuf, bary, dists


# --------------------------------------------------------------------------- #
# Reference-named public helpers (reference rasterize_meshes.py:664-765).
# The internal math above uses the squared-distance / tuple-free forms;
# these wrappers expose the reference's exact API.
# --------------------------------------------------------------------------- #


def barycentric_coordinates(p, v0, v1, v2):
    """(w0, w1, w2) of point p w.r.t. triangle (v0, v1, v2) (reference
    :691)."""
    return tuple(
        jnp.moveaxis(barycentric_coords(p, v0, v1, v2), -1, 0)
    )


def barycentric_coordinates_clip(bary):
    """Clamp negative barycentrics to 0 and renormalize (reference :664).
    Accepts and returns a (w0, w1, w2) tuple."""
    w0 = jnp.clip(bary[0], 0.0)
    w1 = jnp.clip(bary[1], 0.0)
    w2 = jnp.clip(bary[2], 0.0)
    s = jnp.clip(w0 + w1 + w2, 1e-5)
    return (w0 / s, w1 / s, w2 / s)


def point_line_distance(p, v0, v1):
    """Squared distance from p to segment (v0, v1) (reference :709 —
    despite its name the reference returns the non-square-rooted value)."""
    if p.shape != v0.shape or v0.shape != v1.shape:
        raise ValueError("All points must have the same number of coordinates")
    return point_line_segment_distance2(p, v0, v1)


def point_triangle_distance(p, v0, v1, v2):
    """Squared distance from p to triangle (v0, v1, v2) (reference :748)."""
    if p.shape != v0.shape or v0.shape != v1.shape or v1.shape != v2.shape:
        raise ValueError("All points must have the same number of coordinates")
    return point_triangle_distance2(p, v0, v1, v2)


def rasterize_meshes_python(
    meshes,
    image_size: Union[int, Tuple[int, int]] = 256,
    blur_radius: float = 0.0,
    faces_per_pixel: int = 8,
    perspective_correct: bool = False,
    clip_barycentric_coords: bool = False,
    cull_backfaces: bool = False,
    z_clip_value: Optional[float] = None,
    cull_to_frustum: bool = False,
):
    """The reference's pure-python rasterizer entry (reference :548).
    Here the XLA scan oracle (`bin_size=0`) IS the non-kernel reference
    path, so this is an alias of it."""
    return rasterize_meshes(
        meshes,
        image_size=image_size,
        blur_radius=blur_radius,
        faces_per_pixel=faces_per_pixel,
        bin_size=0,
        perspective_correct=perspective_correct,
        clip_barycentric_coords=clip_barycentric_coords,
        cull_backfaces=cull_backfaces,
        z_clip_value=z_clip_value,
        cull_to_frustum=cull_to_frustum,
    )
