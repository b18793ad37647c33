"""Visualization connection helpers.

Parity: reference implicitron/tools/vis_utils.py (visdom helpers).  visdom
is not available in this environment; `get_visdom_connection` returns None
(callers must guard) and plots fall back to matplotlib files.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


def get_visdom_env(visdom_env: str, exp_dir: str) -> str:
    if visdom_env:
        return visdom_env
    import os

    return os.path.basename(os.path.normpath(exp_dir))


def get_visdom_connection(server: str = "http://localhost", port: int = 8097):
    """Returns a visdom.Visdom if the package exists, else None."""
    try:
        from visdom import Visdom  # type: ignore

        return Visdom(server=server, port=port)
    except ImportError:
        logger.info("visdom unavailable; plots will be written as files")
        return None


def visualize_basics(viz, preds: Dict[str, Any], visdom_env_imgs: str,
                     title: str = "", **kwargs) -> None:
    """Show rendered images; matplotlib-file fallback when viz is None."""
    import numpy as np

    images = {
        k: np.asarray(v)
        for k, v in preds.items()
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) == 4
    }
    if viz is not None:  # pragma: no cover (visdom not installed here)
        for k, im in images.items():
            viz.images(im.transpose(0, 3, 1, 2), env=visdom_env_imgs,
                       win=k, opts={"title": f"{title}_{k}"})
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for k, im in images.items():
        fig, ax = plt.subplots()
        ax.imshow(im[0].clip(0, 1))
        ax.set_title(f"{title}_{k}")
        fig.savefig(f"/tmp/visualize_{k}.png")
        plt.close(fig)


def make_depth_image(
    depths,
    masks,
    max_quantile: float = 0.98,
    min_quantile: float = 0.02,
    min_out_depth: float = 0.1,
    max_out_depth: float = 0.9,
):
    """Convert (B, 1, H, W) depths + masks to grayscale images in
    [0, 1] using per-image quantile normalization (reference
    vis_utils.py:145)."""
    import jax.numpy as jnp
    import numpy as np

    depths = jnp.asarray(depths)
    masks = jnp.asarray(masks)
    normfacs = []
    for d, m in zip(np.asarray(depths), np.asarray(masks)):
        ok = (d.reshape(-1) > 1e-6) & (m.reshape(-1) > 0.5)
        if ok.sum() <= 1:
            normfacs.append(np.zeros(2, depths.dtype))
            continue
        dok = d.reshape(-1)[ok]
        _maxk = max(int(round((1 - max_quantile) * dok.size)), 1)
        _mink = max(int(round(min_quantile * dok.size)), 1)
        srt = np.sort(dok)
        normfacs.append(
            np.stack([srt[_mink - 1], srt[-_maxk]]).astype(depths.dtype)
        )
    normfacs = jnp.asarray(np.stack(normfacs))
    _min = normfacs[:, 0].reshape(-1, 1, 1, 1)
    _max = normfacs[:, 1].reshape(-1, 1, 1, 1)
    out = (depths - _min) / jnp.clip(_max - _min, 1e-4)
    out = (
        out * (max_out_depth - min_out_depth) + min_out_depth
    ) * masks.astype(depths.dtype)
    return jnp.clip(out, 0.0, 1.0)
