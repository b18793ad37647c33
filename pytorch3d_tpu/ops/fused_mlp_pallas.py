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
