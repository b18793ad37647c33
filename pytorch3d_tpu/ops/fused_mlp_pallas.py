"""Fused multi-layer MLP-with-skips Pallas kernel (NeRF trunk hot loop).

Why this exists (the NeRF MFU plateau, benchmarks/PERF_ANALYSIS.md):
at hidden width 256 in bf16, one Dense layer moves 2*(N*256) bytes of
activations through HBM for 2*N*256*256 FLOPs — arithmetic intensity
~128 FLOP/byte against the ~240 FLOP/byte a v5e needs to keep the MXU
busy (197 TFLOP/s bf16 / 819 GB/s).  Layer-by-layer execution is
therefore HBM-BOUND at ~0.53 MFU no matter how good XLA is.  All eight
weight matrices of the mlp256x8 trunk total ~1 MB — they fit in VMEM
with room to spare — so this kernel streams row-blocks of points through
ALL layers back-to-back with activations resident in VMEM: HBM traffic
drops to one read of x and one write of the output, and the chain
becomes compute-bound.

The backward kernel recomputes the layer activations per block (VMEM
remat — cheaper than storing N*256*L activations in HBM) and
accumulates the weight/bias gradients across row-blocks in
VMEM-resident output blocks (the same sequential-grid accumulation the
rasterizer's top-K kernel uses).

Replaces the per-layer Dense stack of `MLPWithInputSkips`
(models/nerf/implicit_function.py; reference
projects/nerf/nerf/implicit_function.py:229) on TPU.  The pure-jnp path
remains the oracle (tests/test_fused_mlp.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of points per grid step; the per-layer remat cache for 8 layers
# at (BN, 256) plus the resident weights stays well inside ~16 MB VMEM.
_BN = 512


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_chain(x, w_list, b_list, skips, out_dtype):
    """The shared layer chain (used by both kernels so the relu masks of
    the backward recompute match the forward bit-for-bit)."""
    y = x
    inputs, masks = [], []
    for li in range(len(w_list)):
        if li in skips:
            y = jnp.concatenate([y, x], axis=-1)
        inputs.append(y)
        h = (
            jnp.dot(y, w_list[li], preferred_element_type=jnp.float32)
            + b_list[li]
        )
        masks.append(h > 0.0)
        y = jnp.maximum(h, 0.0).astype(out_dtype)
    return y, inputs, masks


def _fwd_kernel(x_ref, *refs, n_layers: int, skips: Tuple[int, ...]):
    w_list = [refs[i][...] for i in range(n_layers)]
    b_list = [refs[n_layers + i][...] for i in range(n_layers)]
    out_ref = refs[2 * n_layers]
    x = x_ref[...]
    y, _, _ = _fwd_chain(x, w_list, b_list, skips, x.dtype)
    out_ref[...] = y


def _bwd_kernel(x_ref, g_ref, *refs, n_layers: int, skips: Tuple[int, ...]):
    L = n_layers
    w_list = [refs[i][...] for i in range(L)]
    b_list = [refs[L + i][...] for i in range(L)]
    dx_ref = refs[2 * L]
    dw_refs = refs[2 * L + 1 : 3 * L + 1]
    db_refs = refs[3 * L + 1 : 4 * L + 1]

    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)
    _, inputs, masks = _fwd_chain(x, w_list, b_list, skips, x.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for li in range(L):
            dw_refs[li][...] = jnp.zeros_like(dw_refs[li])
            db_refs[li][...] = jnp.zeros_like(db_refs[li])

    dx_acc = jnp.zeros(x.shape, jnp.float32)
    for li in range(L - 1, -1, -1):
        g = jnp.where(masks[li], g, 0.0)
        dw = jax.lax.dot_general(
            inputs[li], g.astype(inputs[li].dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_refs[li][...] += dw
        db_refs[li][...] += jnp.sum(g, axis=0, keepdims=True)
        g = jax.lax.dot_general(
            g.astype(w_list[li].dtype), w_list[li],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if li in skips:
            d_x = x.shape[-1]
            dx_acc = dx_acc + g[:, -d_x:]
            g = g[:, :-d_x]
    dx_ref[...] = (dx_acc + g).astype(x.dtype)


def _padded_weights(x_dtype, D, Dp, H, weights, biases, skips):
    """Zero-pad each weight's contraction rows to the padded lane count
    of its input segment (padded x lanes are zero, so the extra rows are
    never touched)."""
    w_pad, b_pad = [], []
    for li, (w, b) in enumerate(zip(weights, biases)):
        if li == 0:
            wp = jnp.zeros((Dp, H), w.dtype).at[:D].set(w)
        elif li in skips:
            wp = jnp.zeros((H + Dp, H), w.dtype)
            wp = wp.at[:H].set(w[:H])
            wp = wp.at[H : H + D].set(w[H:])
        else:
            wp = w
        w_pad.append(wp.astype(x_dtype))
        b_pad.append(b.reshape(1, H).astype(jnp.float32))
    return w_pad, b_pad


def _specs_for(arrs, fn):
    return [
        pl.BlockSpec(a.shape, fn, memory_space=pltpu.VMEM) for a in arrs
    ]


_INTERPRET = False  # flipped by tests on CPU


def _call(kernel, grid, in_specs, out_specs, out_shape, args):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mlp(x, weights, biases, skips):
    """relu-MLP with input-skip concat, fused over all layers.

    Args:
        x: (N, D) input (also the skip input).
        weights: tuple of (in_i, H) matrices; in_0 = D, in_skip = H + D.
        biases: tuple of (H,) vectors.
        skips: STATIC tuple of layer indices that concat x before the dot.
    Returns:
        (N, H) activations of the last layer (relu'd), dtype of x.
    """
    return _fused_mlp_fwd_impl(x, weights, biases, skips)


def _fused_mlp_fwd_impl(x, weights, biases, skips):
    n_layers = len(weights)
    N, D = x.shape
    H = weights[0].shape[1]
    dtype = x.dtype

    Dp = -(-D // 128) * 128
    Np = -(-N // _BN) * _BN
    xp = _pad_to(_pad_to(x, 1, 128), 0, _BN)
    w_pad, b_pad = _padded_weights(dtype, D, Dp, H, weights, biases, skips)

    row = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    in_specs = (
        [pl.BlockSpec((_BN, Dp), row, memory_space=pltpu.VMEM)]
        + _specs_for(w_pad, whole)
        + _specs_for(b_pad, whole)
    )
    out = _call(
        functools.partial(_fwd_kernel, n_layers=n_layers, skips=tuple(skips)),
        (Np // _BN,),
        in_specs,
        pl.BlockSpec((_BN, H), row, memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((Np, H), dtype),
        [xp, *w_pad, *b_pad],
    )
    return out[:N]


def _fused_mlp_fwd(x, weights, biases, skips):
    return _fused_mlp_fwd_impl(x, weights, biases, skips), (
        x, weights, biases,
    )


def _fused_mlp_bwd(skips, res, g):
    x, weights, biases = res
    n_layers = len(weights)
    N, D = x.shape
    H = weights[0].shape[1]
    dtype = x.dtype

    Dp = -(-D // 128) * 128
    Np = -(-N // _BN) * _BN
    xp = _pad_to(_pad_to(x, 1, 128), 0, _BN)
    gp = _pad_to(g.astype(dtype), 0, _BN)
    w_pad, b_pad = _padded_weights(dtype, D, Dp, H, weights, biases, skips)

    row = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    in_specs = (
        [
            pl.BlockSpec((_BN, Dp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, H), row, memory_space=pltpu.VMEM),
        ]
        + _specs_for(w_pad, whole)
        + _specs_for(b_pad, whole)
    )
    out_specs = (
        [pl.BlockSpec((_BN, Dp), row, memory_space=pltpu.VMEM)]
        + _specs_for(w_pad, whole)
        + _specs_for(b_pad, whole)
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((Np, Dp), dtype)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w_pad]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b_pad]
    )
    outs = _call(
        functools.partial(_bwd_kernel, n_layers=n_layers, skips=tuple(skips)),
        (Np // _BN,),
        in_specs,
        out_specs,
        out_shapes,
        [xp, gp, *w_pad, *b_pad],
    )
    dxp = outs[0]
    dw_pad = outs[1 : n_layers + 1]
    db_pad = outs[n_layers + 1 :]

    dx = dxp[:N, :D].astype(x.dtype)
    dws, dbs = [], []
    for li, (w, b) in enumerate(zip(weights, biases)):
        dwp = dw_pad[li]
        if li == 0:
            dw = dwp[:D]
        elif li in skips:
            dw = jnp.concatenate([dwp[:H], dwp[H : H + D]], axis=0)
        else:
            dw = dwp
        dws.append(dw.astype(w.dtype))
        dbs.append(db_pad[li].reshape(b.shape).astype(b.dtype))
    return dx, tuple(dws), tuple(dbs)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_reference(x, weights, biases, skips):
    """Pure-jnp oracle with identical math (used by tests and CPU)."""
    y = x
    for li in range(len(weights)):
        if li in skips:
            y = jnp.concatenate([y, x], axis=-1)
        h = (
            jnp.dot(y, weights[li], preferred_element_type=jnp.float32)
            + biases[li]
        )
        y = jnp.maximum(h, 0.0).astype(x.dtype)
    return y


# --------------------------------------------------------------------------- #
# Fused NeRF field: trunk + density head + view-conditioned color head
# --------------------------------------------------------------------------- #
#
# Extends the fused trunk with everything after it (reference
# projects/nerf/nerf/implicit_function.py:21 NeuralRadianceField):
#   raw_density = y @ Wd + bd                       (256 -> 1)
#   il          = y @ Wi + bi                       (256 -> 256)
#   h           = relu(il @ Wc1a + dE @ Wc1b + bc1) (256+Ddir -> 128)
#   rgb_logits  = h @ Wc2 + bc2                     (128 -> 3)
# The head weights total ~0.6 MB and stay VMEM-resident next to the
# trunk's ~1 MB, which removes three more HBM round trips of (N, 256)/
# (N, 283)/(N, 128) activations per pass.  The narrow outputs are packed
# into one (N, 128) block via zero-padded weight columns (col 0 = raw
# density, cols 1:4 = rgb logits) so every store stays a full-lane MXU
# matmul -- no lane-sliced writes.

_HEAD_OUT = 128  # packed output lanes


def _head_fwd(y, dE, hw, out_dtype):
    """Shared head math; returns (out4, il, h_mask, h)."""
    (wd, wi, bi, wc1a, wc1b, bc1, wc2, b4) = hw
    il = (
        jnp.dot(y, wi, preferred_element_type=jnp.float32) + bi
    ).astype(out_dtype)
    h_pre = (
        jnp.dot(il, wc1a, preferred_element_type=jnp.float32)
        + jnp.dot(dE, wc1b, preferred_element_type=jnp.float32)
        + bc1
    )
    h = jnp.maximum(h_pre, 0.0).astype(out_dtype)
    out4 = (
        jnp.dot(y, wd, preferred_element_type=jnp.float32)
        + jnp.dot(h, wc2, preferred_element_type=jnp.float32)
        + b4
    )
    return out4, il, (h_pre > 0.0), h


def _nerf_fwd_kernel(x_ref, de_ref, *refs, n_layers: int,
                     skips: Tuple[int, ...]):
    L = n_layers
    w_list = [refs[i][...] for i in range(L)]
    b_list = [refs[L + i][...] for i in range(L)]
    hw = tuple(refs[2 * L + i][...] for i in range(8))
    out_ref = refs[2 * L + 8]
    x = x_ref[...]
    y, _, _ = _fwd_chain(x, w_list, b_list, skips, x.dtype)
    out4, _, _, _ = _head_fwd(y, de_ref[...], hw, x.dtype)
    out_ref[...] = out4.astype(x.dtype)


def _nerf_bwd_kernel(x_ref, de_ref, g_ref, *refs, n_layers: int,
                     skips: Tuple[int, ...]):
    L = n_layers
    w_list = [refs[i][...] for i in range(L)]
    b_list = [refs[L + i][...] for i in range(L)]
    hw = tuple(refs[2 * L + i][...] for i in range(8))
    (wd, wi, bi, wc1a, wc1b, bc1, wc2, b4) = hw
    o = 2 * L + 8
    dx_ref, dde_ref = refs[o], refs[o + 1]
    dw_refs = refs[o + 2 : o + 2 + L]
    db_refs = refs[o + 2 + L : o + 2 + 2 * L]
    dhw_refs = refs[o + 2 + 2 * L : o + 2 + 2 * L + 8]

    x = x_ref[...]
    dE = de_ref[...]
    g4 = g_ref[...].astype(jnp.float32)
    y, inputs, masks = _fwd_chain(x, w_list, b_list, skips, x.dtype)
    _, il, h_mask, h = _head_fwd(y, dE, hw, x.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for r in list(dw_refs) + list(db_refs) + list(dhw_refs):
            r[...] = jnp.zeros_like(r)

    def dot_nt(a, b):  # a^T @ b with f32 accumulation
        return jax.lax.dot_general(
            a, b.astype(a.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_tn(g, w):  # g @ w^T
        return jax.lax.dot_general(
            g.astype(w.dtype), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # head reverse
    dhw_refs[7][...] += jnp.sum(g4, axis=0, keepdims=True)     # b4
    dhw_refs[6][...] += dot_nt(h, g4)                          # wc2
    gh = jnp.where(h_mask, dot_tn(g4, wc2), 0.0)
    dhw_refs[5][...] += jnp.sum(gh, axis=0, keepdims=True)     # bc1
    dhw_refs[4][...] += dot_nt(dE, gh)                         # wc1b
    dhw_refs[3][...] += dot_nt(il, gh)                         # wc1a
    dde_ref[...] = dot_tn(gh, wc1b).astype(dE.dtype)
    gil = dot_tn(gh, wc1a)
    dhw_refs[2][...] += jnp.sum(gil, axis=0, keepdims=True)    # bi
    dhw_refs[1][...] += dot_nt(y, gil.astype(y.dtype))         # wi
    dhw_refs[0][...] += dot_nt(y, g4)                          # wd
    g = dot_tn(gil, wi) + dot_tn(g4, wd)

    # trunk reverse (identical to _bwd_kernel)
    dx_acc = jnp.zeros(x.shape, jnp.float32)
    for li in range(L - 1, -1, -1):
        g = jnp.where(masks[li], g, 0.0)
        dw_refs[li][...] += jax.lax.dot_general(
            inputs[li], g.astype(inputs[li].dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_refs[li][...] += jnp.sum(g, axis=0, keepdims=True)
        g = jax.lax.dot_general(
            g.astype(w_list[li].dtype), w_list[li],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if li in skips:
            d_x = x.shape[-1]
            dx_acc = dx_acc + g[:, -d_x:]
            g = g[:, :-d_x]
    dx_ref[...] = (dx_acc + g).astype(x.dtype)


def _pack_head(head, dtype, H, Dd, Dh):
    """Zero-pad head weights: Wd (H,1)->(H,128) col 0, Wc2 (Dh,3)->(Dh,128)
    cols 1:4, biases into one (1,128) row; dE rows padded to Dd lanes."""
    (wd, bd, wi, bi, wc1a, wc1b, bc1, wc2, bc2) = head
    Hh = wc1a.shape[1]
    wd_p = jnp.zeros((H, _HEAD_OUT), dtype).at[:, 0:1].set(wd.astype(dtype))
    wc2_p = jnp.zeros((Hh, _HEAD_OUT), dtype).at[:, 1:4].set(
        wc2.astype(dtype)
    )
    b4 = jnp.zeros((1, _HEAD_OUT), jnp.float32)
    b4 = b4.at[0, 0].set(bd[0].astype(jnp.float32))
    b4 = b4.at[0, 1:4].set(bc2.astype(jnp.float32))
    wc1b_p = jnp.zeros((Dd, Hh), dtype).at[: wc1b.shape[0]].set(
        wc1b.astype(dtype)
    )
    return (
        wd_p,
        wi.astype(dtype),
        bi.reshape(1, -1).astype(jnp.float32),
        wc1a.astype(dtype),
        wc1b_p,
        bc1.reshape(1, -1).astype(jnp.float32),
        wc2_p,
        b4,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_nerf_field(x, d_embed, weights, biases, head, skips):
    """Full NeRF field in one kernel.

    Args:
        x: (N, D) harmonic-embedded points (also the skip input).
        d_embed: (N, Ddir) harmonic-embedded unit view directions.
        weights/biases: trunk layers (as `fused_mlp`).
        head: tuple (wd (H,1), bd (1,), wi (H,H), bi (H,), wc1a (H,Hh),
            wc1b (Ddir,Hh), bc1 (Hh,), wc2 (Hh,3), bc2 (3,)).
        skips: STATIC trunk skip indices.
    Returns:
        (N, 4): [raw_density, r, g, b] pre-activation (caller applies the
        delta-opacity transform and sigmoid).
    """
    return _fnf_fwd_impl(x, d_embed, weights, biases, head, skips)


def _fnf_shapes(x, d_embed, weights, bn=_BN):
    n_layers = len(weights)
    N, D = x.shape
    H = weights[0].shape[1]
    Dd = -(-d_embed.shape[1] // 128) * 128
    Dp = -(-D // 128) * 128
    Np = -(-N // bn) * bn
    return n_layers, N, D, H, Dd, Dp, Np


# backward row-block: the per-block remat cache (8 trunk layer inputs +
# head intermediates + resident weights + weight-grad accumulators) hits
# the 16 MB VMEM scope at 512 rows fp32 (measured: 16.38M), so the field
# backward streams half-size blocks.
_BN_BWD = 256


def _fnf_fwd_impl(x, d_embed, weights, biases, head, skips):
    n_layers, N, D, H, Dd, Dp, Np = _fnf_shapes(x, d_embed, weights)
    dtype = x.dtype
    xp = _pad_to(_pad_to(x, 1, 128), 0, _BN)
    dep = _pad_to(_pad_to(d_embed.astype(dtype), 1, 128), 0, _BN)
    w_pad, b_pad = _padded_weights(dtype, D, Dp, H, weights, biases, skips)
    hw = _pack_head(head, dtype, H, Dd, head[4].shape[1])

    row = lambda i: (i, 0)
    in_specs = (
        [
            pl.BlockSpec((_BN, Dp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, Dd), row, memory_space=pltpu.VMEM),
        ]
        + _specs_for(w_pad, lambda i: (0, 0))
        + _specs_for(b_pad, lambda i: (0, 0))
        + _specs_for(hw, lambda i: (0, 0))
    )
    out = _call(
        functools.partial(
            _nerf_fwd_kernel, n_layers=n_layers, skips=tuple(skips)
        ),
        (Np // _BN,),
        in_specs,
        pl.BlockSpec((_BN, _HEAD_OUT), row, memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((Np, _HEAD_OUT), dtype),
        [xp, dep, *w_pad, *b_pad, *hw],
    )
    return out[:N, :4]


def _fnf_fwd(x, d_embed, weights, biases, head, skips):
    return (
        _fnf_fwd_impl(x, d_embed, weights, biases, head, skips),
        (x, d_embed, weights, biases, head),
    )


def _fnf_bwd(skips, res, g):
    x, d_embed, weights, biases, head = res
    n_layers, N, D, H, Dd, Dp, Np = _fnf_shapes(x, d_embed, weights, _BN_BWD)
    dtype = x.dtype
    L = n_layers
    Hh = head[4].shape[1]
    xp = _pad_to(_pad_to(x, 1, 128), 0, _BN_BWD)
    dep = _pad_to(_pad_to(d_embed.astype(dtype), 1, 128), 0, _BN_BWD)
    gp = jnp.zeros((Np, _HEAD_OUT), dtype)
    gp = gp.at[:N, :4].set(g.astype(dtype))
    w_pad, b_pad = _padded_weights(dtype, D, Dp, H, weights, biases, skips)
    hw = _pack_head(head, dtype, H, Dd, Hh)

    row = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    in_specs = (
        [
            pl.BlockSpec((_BN_BWD, Dp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN_BWD, Dd), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN_BWD, _HEAD_OUT), row, memory_space=pltpu.VMEM),
        ]
        + _specs_for(w_pad, whole)
        + _specs_for(b_pad, whole)
        + _specs_for(hw, whole)
    )
    out_specs = (
        [
            pl.BlockSpec((_BN_BWD, Dp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN_BWD, Dd), row, memory_space=pltpu.VMEM),
        ]
        + _specs_for(w_pad, whole)
        + _specs_for(b_pad, whole)
        + _specs_for(hw, whole)
    )
    out_shapes = (
        [
            jax.ShapeDtypeStruct((Np, Dp), dtype),
            jax.ShapeDtypeStruct((Np, Dd), dtype),
        ]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w_pad]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b_pad]
        + [jax.ShapeDtypeStruct(h.shape, jnp.float32) for h in hw]
    )
    outs = _call(
        functools.partial(
            _nerf_bwd_kernel, n_layers=n_layers, skips=tuple(skips)
        ),
        (Np // _BN_BWD,),
        in_specs,
        out_specs,
        out_shapes,
        [xp, dep, gp, *w_pad, *b_pad, *hw],
    )
    dxp, ddep = outs[0], outs[1]
    dw_pad = outs[2 : 2 + L]
    db_pad = outs[2 + L : 2 + 2 * L]
    dhw = outs[2 + 2 * L :]

    dx = dxp[:N, :D].astype(x.dtype)
    dde = ddep[:N, : d_embed.shape[1]].astype(d_embed.dtype)
    dws, dbs = [], []
    for li, (w, b) in enumerate(zip(weights, biases)):
        dwp = dw_pad[li]
        if li == 0:
            dw = dwp[:D]
        elif li in skips:
            dw = jnp.concatenate([dwp[:H], dwp[H : H + D]], axis=0)
        else:
            dw = dwp
        dws.append(dw.astype(w.dtype))
        dbs.append(db_pad[li].reshape(b.shape).astype(b.dtype))

    (wd, bd, wi, bi, wc1a, wc1b, bc1, wc2, bc2) = head
    d_head = (
        dhw[0][:, 0:1].astype(wd.dtype),               # wd
        dhw[7][0, 0:1].astype(bd.dtype),               # bd
        dhw[1].astype(wi.dtype),                       # wi
        dhw[2].reshape(bi.shape).astype(bi.dtype),     # bi
        dhw[3].astype(wc1a.dtype),                     # wc1a
        dhw[4][: wc1b.shape[0]].astype(wc1b.dtype),    # wc1b
        dhw[5].reshape(bc1.shape).astype(bc1.dtype),   # bc1
        dhw[6][:, 1:4].astype(wc2.dtype),              # wc2
        dhw[7][0, 1:4].astype(bc2.dtype),              # bc2
    )
    return dx, dde, tuple(dws), tuple(dbs), d_head


fused_nerf_field.defvjp(_fnf_fwd, _fnf_bwd)


def fused_head_reference(y, d_embed, head, dtype):
    """jnp head tail (density + view-conditioned color) — used when the
    trunk fuses but the head widths are not lane-aligned, and by the
    full oracle below."""
    (wd, bd, wi, bi, wc1a, wc1b, bc1, wc2, bc2) = head
    raw_d = jnp.dot(y, wd, preferred_element_type=jnp.float32) + bd
    il = (
        jnp.dot(y, wi, preferred_element_type=jnp.float32) + bi
    ).astype(dtype)
    h_pre = (
        jnp.dot(il, wc1a, preferred_element_type=jnp.float32)
        + jnp.dot(d_embed.astype(dtype), wc1b,
                  preferred_element_type=jnp.float32)
        + bc1
    )
    h = jnp.maximum(h_pre, 0.0).astype(dtype)
    rgb = jnp.dot(h, wc2, preferred_element_type=jnp.float32) + bc2
    return jnp.concatenate([raw_d, rgb], axis=-1)


def fused_nerf_field_reference(x, d_embed, weights, biases, head, skips):
    """Pure-jnp oracle with identical math."""
    y = fused_mlp_reference(x, weights, biases, skips)
    (wd, bd, wi, bi, wc1a, wc1b, bc1, wc2, bc2) = head
    raw_d = jnp.dot(y, wd, preferred_element_type=jnp.float32) + bd
    il = (
        jnp.dot(y, wi, preferred_element_type=jnp.float32) + bi
    ).astype(x.dtype)
    h_pre = (
        jnp.dot(il, wc1a, preferred_element_type=jnp.float32)
        + jnp.dot(d_embed.astype(x.dtype), wc1b,
                  preferred_element_type=jnp.float32)
        + bc1
    )
    h = jnp.maximum(h_pre, 0.0).astype(x.dtype)
    rgb = jnp.dot(h, wc2, preferred_element_type=jnp.float32) + bc2
    return jnp.concatenate([raw_d, rgb], axis=-1)
