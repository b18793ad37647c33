"""Device-mesh construction and sharding specs for rendering workloads.

This is the TPU-native replacement for the reference's parallelism story
(SURVEY.md 2.12): where pytorch3d chunks rays serially
(GenericModel._render, generic_model.py:597) and wraps the trainer in
Accelerate/DDP (experiment.py:206-212), here rays, pixels and batch
elements are *sharded dimensions* over a `jax.sharding.Mesh`, and gradient
all-reduce is an XLA `psum` over ICI.

Axes:
- "dp"   — batch (scenes / images) data parallelism
- "rays" — ray / pixel-tile parallelism within an image (the sharded analog
           of chunk_size_grid / chunk_size_test)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_device_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("dp", "rays"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2D ("dp", "rays") device mesh.

    Default: all devices on the "rays" axis (single-scene fitting scales by
    rays/pixels first; multi-scene training re-shapes to (dp, rays)).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, batch_axis: bool = True) -> NamedSharding:
    """Shard (B, R, ...) ray tensors: B over dp, R over rays."""
    if batch_axis:
        return NamedSharding(mesh, P("dp", "rays"))
    return NamedSharding(mesh, P("rays"))


def shard_pixels(mesh: Mesh) -> NamedSharding:
    """Shard (N, H, W, ...) images: N over dp, H (pixel rows) over rays."""
    return NamedSharding(mesh, P("dp", "rays"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Shard leading batch dim over dp only."""
    return NamedSharding(mesh, P("dp"))
