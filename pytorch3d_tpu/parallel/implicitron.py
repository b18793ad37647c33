"""shard_map data/ray-parallel training for the implicitron GenericModel.

The reference wraps the trainer in HuggingFace Accelerate / DDP
(projects/implicitron_trainer/experiment.py:206-212): each GPU gets a
different batch, gradients all-reduce.  TPU-native equivalent with
EXPLICIT collectives: the train step runs inside `shard_map` over the
mesh's ray axis; every device holds replicated params, folds its
`axis_index` into the RNG so it samples a DISJOINT Monte-Carlo ray batch
of the same scene batch, and the loss/gradients are `pmean`-ed over ICI.
Scaling rays-per-step = n_devices x n_rays_per_image with constant
per-device memory.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_sharded_generic_train_step(
    model,
    optimizer,
    mesh: Mesh,
    axis: str = "rays",
    static_model_kwargs: Optional[dict] = None,
) -> Callable:
    """Build a jitted shard_map train step for GenericModel.

    step(params, opt_state, batch_dict, key) ->
        (params, opt_state, loss)
    where batch_dict holds the (replicated) model inputs: image_rgb,
    camera, fg_probability, and optional extras like sequence_name.
    """
    static_model_kwargs = dict(static_model_kwargs or {})

    def local_loss(params, batch, key):
        out = model.apply(
            params,
            key=key,
            **batch,
            **static_model_kwargs,
        )
        return out["objective"]

    def shard_body(params, batch, key):
        # disjoint ray sampling per device: fold the device's position
        # on the mesh axis into the RNG
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        loss, grads = jax.value_and_grad(local_loss)(params, batch, key)
        # explicit DDP collectives over ICI
        loss = jax.lax.pmean(loss, axis)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, axis), grads
        )
        return loss, grads

    smapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )

    def step(params, opt_state, batch, key):
        loss, grads = smapped(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step)
