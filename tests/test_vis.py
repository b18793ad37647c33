"""Visualization smoke tests (reference tests/test_vis* — figure
construction for meshes/pointclouds/cameras/raybundles and UV maps)."""

import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    look_at_view_transform,
)
from pytorch3d_tpu.structures import Pointclouds
from pytorch3d_tpu.utils import ico_sphere


class TestPlotScene:
    def test_mixed_scene_figure(self):
        from pytorch3d_tpu.renderer.implicit.utils import RayBundle
        from pytorch3d_tpu.vis import plot_scene

        mesh = ico_sphere(1)
        pts = Pointclouds.create(jnp.ones((1, 20, 3)) * 0.3)
        R, T = look_at_view_transform(dist=2.7)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        rb = RayBundle(
            origins=jnp.zeros((1, 4, 3)),
            directions=jnp.ones((1, 4, 3)),
            lengths=jnp.ones((1, 4, 2)),
            xys=jnp.zeros((1, 4, 2)),
        )
        fig = plot_scene(
            {
                "scene": {
                    "mesh": mesh,
                    "points": pts,
                    "cams": cams,
                    "rays": rb,
                }
            }
        )
        assert fig is not None

    def test_batch_individually(self):
        from pytorch3d_tpu.structures import join_meshes_as_batch
        from pytorch3d_tpu.vis import plot_batch_individually

        batch = join_meshes_as_batch([ico_sphere(0), ico_sphere(1)])
        fig = plot_batch_individually(batch, ncols=2)
        assert fig is not None


class TestTextureVis:
    def test_uv_overlay(self):
        from pytorch3d_tpu.renderer.mesh.textures import TexturesUV
        from pytorch3d_tpu.vis import texturesuv_image_matplotlib

        tex = TexturesUV.create(
            maps=jnp.ones((1, 8, 8, 3)) * 0.5,
            faces_uvs=jnp.asarray([[[0, 1, 2]]], jnp.int32),
            verts_uvs=jnp.asarray([[[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]]]),
        )
        out = texturesuv_image_matplotlib(tex)
        assert out is not None
