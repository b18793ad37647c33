"""Model helpers: chunked application over rays.

Parity: reference implicitron/models/utils.py (`apply_chunked`,
`chunk_generator`) — retained for API parity; inside jit prefer the
lax.map chunking of GenericModel._render_chunked or, on a device mesh,
sharding the ray axis (pytorch3d_tpu.parallel).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp


def chunk_generator(
    chunk_size: int,
    ray_bundle,
    chunked_inputs: Dict[str, Any],
    *args,
    tqdm_trigger_threshold: int = 16,
    **kwargs,
) -> Iterator:
    """Yield ray-bundle chunks (reference models/utils.py)."""
    B = ray_bundle.origins.shape[0]
    spatial = ray_bundle.origins.shape[1:-1]
    n_rays = int(math.prod(spatial))
    S = ray_bundle.lengths.shape[-1]
    flat = type(ray_bundle)(
        origins=ray_bundle.origins.reshape(B, n_rays, 3),
        directions=ray_bundle.directions.reshape(B, n_rays, 3),
        lengths=ray_bundle.lengths.reshape(B, n_rays, S),
        xys=ray_bundle.xys.reshape(B, n_rays, 2),
    )
    n_chunks = -(-n_rays // max(chunk_size, 1))
    for i in range(n_chunks):
        sl = slice(i * chunk_size, min((i + 1) * chunk_size, n_rays))
        chunk_bundle = type(ray_bundle)(
            origins=flat.origins[:, sl],
            directions=flat.directions[:, sl],
            lengths=flat.lengths[:, sl],
            xys=flat.xys[:, sl],
        )
        extra = {
            k: (v[:, sl] if hasattr(v, "shape") and v.ndim >= 2 else v)
            for k, v in chunked_inputs.items()
        }
        yield [chunk_bundle, *args], {**kwargs, **extra}


def apply_chunked(func, chunk_generator, tensor_collator) -> Any:
    """Apply func per chunk and collate (reference models/utils.py)."""
    outs = [func(*a, **kw) for a, kw in chunk_generator]
    return jax.tree_util.tree_map(
        lambda *xs: tensor_collator(list(xs)), *outs
    )


def cat_dataclass(batch, tensor_collator):
    """Concatenate a list of dataclass instances field-wise (reference)."""
    import dataclasses

    out = {}
    first = batch[0]
    for f in dataclasses.fields(first):
        vals = [getattr(b, f.name) for b in batch]
        if all(v is None for v in vals):
            out[f.name] = None
        elif hasattr(vals[0], "shape"):
            out[f.name] = tensor_collator(vals)
        else:
            out[f.name] = vals[0]
    return type(first)(**out)
