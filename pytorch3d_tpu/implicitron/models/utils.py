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


def preprocess_input(
    image_rgb,
    fg_probability,
    depth_map,
    mask_images: bool,
    mask_depths: bool,
    mask_threshold: float,
    bg_color,
):
    """Optionally threshold the fg mask and mask the rgb/depth inputs
    (reference models/utils.py:25). Channel-last (B, H, W, C) layout."""
    import warnings

    import jax.numpy as jnp

    from ..tools.image_utils import mask_background

    if image_rgb is not None and image_rgb.ndim == 3:
        raise ValueError(
            "Model received unbatched inputs. Perhaps they came from a "
            "FrameData which had not been collated."
        )

    fg_mask = fg_probability
    if fg_mask is not None and mask_threshold > 0.0:
        warnings.warn("Thresholding masks!")
        fg_mask = (fg_mask >= mask_threshold).astype(fg_mask.dtype)

    if mask_images and fg_mask is not None and image_rgb is not None:
        warnings.warn("Masking images!")
        image_rgb = mask_background(
            image_rgb, fg_mask, bg_color=jnp.asarray(bg_color)
        )

    if mask_depths and fg_mask is not None and depth_map is not None:
        assert mask_threshold > 0.0, (
            "Depths should be masked only with thresholded masks"
        )
        warnings.warn("Masking depths!")
        depth_map = depth_map * fg_mask

    return image_rgb, fg_mask, depth_map


def log_loss_weights(loss_weights, logger) -> None:
    """Print a table of the loss weights (reference models/utils.py:92)."""
    loss_weights_message = (
        "-------\nloss_weights:\n"
        + "\n".join(f"{k:40s}: {w:1.2e}" for k, w in loss_weights.items())
        + "-------"
    )
    logger.info(loss_weights_message)


def weighted_sum_losses(preds, loss_weights):
    """Dot product of individual losses with their weights (reference
    models/utils.py:104); None if no weighted loss is present."""
    import warnings

    losses_weighted = [
        preds[k] * float(w)
        for k, w in loss_weights.items()
        if (k in preds and w != 0.0)
    ]
    if len(losses_weighted) == 0:
        warnings.warn("No main objective found.")
        return None
    return sum(losses_weighted)
