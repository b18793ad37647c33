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
