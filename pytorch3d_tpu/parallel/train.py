"""Sharded training steps: ray-parallel NeRF fitting with psum gradients.

The DDP equivalent (reference experiment.py:206-212 + accelerator.backward
training_loop.py:415) expressed TPU-natively: the loss is computed on
locally-sharded rays inside `shard_map`, gradients are `psum`-ed over the
mesh, and the optimizer update runs replicated.  When jitted with
`NamedSharding` inputs, XLA inserts the same collectives automatically —
`make_nerf_train_step` uses the jit/sharding path (compiler-scheduled
all-reduce overlaps backward).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def psum_grads(grads, axis_name: str):
    """All-reduce gradients over a mesh axis (DDP grad sync)."""
    return jax.tree_util.tree_map(
        lambda g: jax.lax.psum(g, axis_name), grads
    )


def make_nerf_train_step(
    model,
    optimizer,
    mesh: Optional[Mesh] = None,
    compute_dtype=None,
) -> Callable:
    """Build a jitted (optionally mesh-sharded) NeRF train step.

    The step renders a Monte-Carlo ray batch, computes coarse+fine MSE to
    the target image, and applies an optax update.  With a mesh, ray-batch
    inputs are sharded over ("dp", "rays") and parameters replicated; XLA
    lowers the gradient reduction to an ICI all-reduce.

    Args:
        model: RadianceFieldRenderer (flax module).
        optimizer: optax GradientTransformation.
        mesh: optional jax.sharding.Mesh with axes ("dp", "rays").
        compute_dtype: optional dtype (e.g. jnp.bfloat16) for MIXED
            PRECISION: the fp32 master params are cast to this dtype for
            the forward/backward pass (one MXU pass per matmul instead
            of fp32's multi-pass), gradients are cast back to fp32, and
            the optimizer updates the fp32 masters.

    Returns:
        step(params, opt_state, cameras, image, key) ->
            (params, opt_state, metrics)
    """

    ray_sharding = (
        NamedSharding(mesh, P("dp", "rays")) if mesh is not None else None
    )

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def loss_fn(params, cameras, image, key):
        if compute_dtype is not None:
            params = _cast(params, compute_dtype)
        out, metrics = model.apply(
            params, cameras, image=image, training=True, key=key,
            ray_sharding=ray_sharding,
        )
        loss = metrics["mse_coarse"] + metrics["mse_fine"]
        return jnp.asarray(loss, jnp.float32), jax.tree_util.tree_map(
            lambda m: jnp.asarray(m, jnp.float32), metrics
        )

    def step(params, opt_state, cameras, image, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cameras, image, key
        )
        if compute_dtype is not None:
            # gradients come back in compute_dtype; update fp32 masters
            grads = _cast(grads, jnp.float32)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    img_sharding = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, img_sharding, img_sharding, repl),
        out_shardings=(repl, repl, repl),
    )
