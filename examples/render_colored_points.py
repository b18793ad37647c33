"""Render a colored pointcloud with the points pipeline.

Mirrors the reference tutorial docs/tutorials/render_colored_points.ipynb:
a torus sampled into a colored Pointclouds object rendered through
PointsRasterizer + AlphaCompositor and NormWeightedCompositor.
"""

from _example_utils import image_grid, save_image

import jax
import jax.numpy as jnp

from pytorch3d_tpu.ops import sample_points_from_meshes
from pytorch3d_tpu.renderer import (
    AlphaCompositor,
    FoVOrthographicCameras,
    NormWeightedCompositor,
    PointsRasterizationSettings,
    PointsRasterizer,
    PointsRenderer,
    look_at_view_transform,
)
from pytorch3d_tpu.structures import Pointclouds
from pytorch3d_tpu.utils import torus


def main() -> None:
    # a torus point cloud, colored by position
    mesh = torus(r=0.35, R=1.0, sides=48, rings=96)
    pts = sample_points_from_meshes(
        mesh, num_samples=30_000, key=jax.random.PRNGKey(0)
    )[0]
    rgb = (pts - pts.min(axis=0)) / (pts.max(axis=0) - pts.min(axis=0))
    cloud = Pointclouds.create(pts[None], features=rgb[None])

    R, T = look_at_view_transform(dist=3.0, elev=25.0, azim=30.0)
    cameras = FoVOrthographicCameras.create(R=R, T=T, znear=0.01)
    settings = PointsRasterizationSettings(
        image_size=256, radius=0.006, points_per_pixel=10
    )
    rasterizer = PointsRasterizer(cameras=cameras, raster_settings=settings)

    images = []
    for comp in (AlphaCompositor(), NormWeightedCompositor()):
        renderer = PointsRenderer(rasterizer=rasterizer, compositor=comp)
        images.append(renderer(cloud)[0])

    grid = image_grid([jnp.asarray(im) for im in images], cols=2)
    save_image("colored_points.png", grid)
    covered = float(jnp.mean((images[0].sum(-1) > 0.05)))
    print(f"coverage: {covered:.3f}")
    assert covered > 0.1


if __name__ == "__main__":
    main()
