"""Shared helpers for the worked examples (CPU-forced, image saving)."""

from __future__ import annotations

import os
import sys

# run on CPU so the examples work anywhere (and in minutes); they run
# unchanged on TPU if you delete these lines (the config.update is
# needed too: a preinstalled TPU platform plugin can ignore the env var)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def save_image(name: str, array) -> str:
    """Save an (H, W, 3|4) float [0,1] array as a PNG under examples/out."""
    import numpy as np
    from PIL import Image

    os.makedirs(OUT_DIR, exist_ok=True)
    arr = np.asarray(array)
    if arr.ndim == 4:
        arr = arr[0]
    arr = (np.clip(arr[..., :3], 0.0, 1.0) * 255).astype(np.uint8)
    path = os.path.join(OUT_DIR, name)
    Image.fromarray(arr).save(path)
    print(f"wrote {path}")
    return path


def image_grid(images, cols: int):
    """Tile a list of same-shape (H, W, C) arrays into one image."""
    import numpy as np

    images = [np.asarray(im) for im in images]
    rows = (len(images) + cols - 1) // cols
    h, w = images[0].shape[:2]
    grid = np.ones((rows * h, cols * w, images[0].shape[-1]), images[0].dtype)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    return grid
