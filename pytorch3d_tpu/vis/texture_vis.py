"""UV texture visualization (reference vis/texture_vis.py:16)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def texturesuv_image_matplotlib(
    texture,
    *,
    texture_index: int = 0,
    radius: float = 1.0,
    color=(1.0, 0.0, 0.0),
    subsample: Optional[int] = 10000,
    origin: str = "upper",
):
    """Plot a TexturesUV map with the vertex UVs overlaid (reference :16)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    maps = texture.maps_padded()
    uvs = texture.verts_uvs_padded()
    # our TexturesUV stores these as pytree fields; the reference exposes
    # methods — accept both
    maps = maps() if callable(maps) else maps
    uvs = uvs() if callable(uvs) else uvs
    texture_image = np.asarray(maps[texture_index])
    verts_uvs = np.asarray(uvs[texture_index])
    if subsample is not None and verts_uvs.shape[0] > subsample:
        idx = np.random.choice(verts_uvs.shape[0], subsample, replace=False)
        verts_uvs = verts_uvs[idx]

    fig, ax = plt.subplots()
    ax.imshow(texture_image, origin=origin)
    H, W = texture_image.shape[:2]
    x = verts_uvs[:, 0] * (W - 1)
    y = verts_uvs[:, 1] * (H - 1)
    if origin == "upper":
        y = (H - 1) - y
    ax.scatter(x, y, s=radius, c=[color])
    return fig


def texturesuv_image_PIL(
    texture,
    *,
    texture_index: int = 0,
    radius: float = 1.0,
    color="red",
    subsample: Optional[int] = 10000,
):
    """A PIL image of a TexturesUV map with the vertex UVs overlaid as
    dots (reference texture_vis.py:73)."""
    from PIL import Image, ImageDraw

    centers = np.asarray(texture.centers_for_image(texture_index))
    maps = texture.maps_padded()
    maps = maps() if callable(maps) else maps
    texture_image = np.asarray(maps[texture_index])
    img = Image.fromarray(
        (np.clip(texture_image, 0, 1) * 255).astype(np.uint8)
    )
    draw = ImageDraw.Draw(img)
    if subsample is not None and centers.shape[0] > subsample:
        idx = np.random.choice(centers.shape[0], subsample, replace=False)
        centers = centers[idx]
    for x, y in centers:
        draw.ellipse(
            [(x - radius, y - radius), (x + radius, y + radius)], fill=color
        )
    return img
