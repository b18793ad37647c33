"""Textured-cow renders vs the reference's shipped goldens
(reference tests/test_render_meshes.py:536 `_texture_map_per_rasterizer`
and :1253 `_texture_map_atlas`): TexturesUV soft-Phong back/front views
and the 8x8 per-face texture atlas — the end-to-end check of the
SoftRas atlas bake + TexturesAtlas sampling path on real data.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from golden_utils import golden_size, mad_tol, pool_golden
import pytest

from pytorch3d_tpu.io import load_obj
from pytorch3d_tpu.renderer import (
    BlendParams,
    FoVPerspectiveCameras,
    Materials,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.shader import (
    HardPhongShader,
    SoftPhongShader,
)
from pytorch3d_tpu.renderer.mesh.textures import TexturesAtlas, TexturesUV
from pytorch3d_tpu.structures import Meshes

DATA = "/root/reference/tests/data"
COW = "/root/reference/docs/tutorials/data/cow_mesh/cow.obj"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(COW), reason="cow mesh not available"
)


def _golden(name):
    from PIL import Image

    with Image.open(os.path.join(DATA, name)) as f:
        return pool_golden(np.asarray(f, np.float32)[..., :3] / 255.0)


def _uv_mesh():
    verts, faces, aux = load_obj(COW, load_textures=True, texture_wrap=None)
    tex_map = list(aux.texture_images.values())[0][None]
    textures = TexturesUV.create(
        maps=tex_map,
        faces_uvs=faces.textures_idx[None],
        verts_uvs=aux.verts_uvs[None],
    )
    return Meshes.create([verts], [faces.verts_idx], textures=textures)


class TestCowTextureMap:
    @pytest.mark.parametrize("side", ["back", "front"])
    def test_texture_map_golden(self, side):
        mesh = _uv_mesh()
        azim = 0.0 if side == "back" else 180.0
        light_z = 2.0 if side == "back" else -2.0
        R, T = look_at_view_transform(2.7, 0.0, azim)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        renderer = MeshRenderer(
            MeshRasterizer(
                cams,
                RasterizationSettings(
                    image_size=golden_size(512), blur_radius=0.0,
                    faces_per_pixel=1,
                ),
            ),
            SoftPhongShader(
                cameras=cams,
                lights=PointLights.create(
                    location=jnp.asarray([[0.0, 0.0, light_z]])
                ),
                materials=Materials.create(),
                blend_params=BlendParams(
                    sigma=1e-1, gamma=1e-4,
                    background_color=(1.0, 1.0, 1.0),
                ),
            ),
        )
        rgb = np.asarray(renderer(mesh))[0, ..., :3]
        ref = _golden(f"test_texture_map_{side}_MeshRasterizer.png")
        mad = np.abs(rgb - ref).mean()
        assert mad < mad_tol(0.01), f"{side}: mad {mad}"

    def test_grad_flows_through_textured_render(self):
        mesh = _uv_mesh()
        R, T = look_at_view_transform(2.7, 0.0, 0.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        renderer = MeshRenderer(
            MeshRasterizer(
                cams, RasterizationSettings(image_size=64)
            ),
            SoftPhongShader(
                cameras=cams,
                lights=PointLights.create(
                    location=jnp.asarray([[0.0, 0.0, 2.0]])
                ),
                blend_params=BlendParams(
                    sigma=1e-1, gamma=1e-4,
                    background_color=(1.0, 1.0, 1.0),
                ),
            ),
        )

        def loss(offset):
            return renderer(mesh.offset_verts(offset)).sum()

        g = jax.grad(loss)(jnp.zeros_like(mesh.verts_padded()[0]))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0


class TestCowTextureAtlas:
    def test_atlas_8x8_golden(self):
        verts, faces, aux = load_obj(
            COW,
            load_textures=True,
            create_texture_atlas=True,
            texture_atlas_size=8,
            texture_wrap=None,
        )
        mesh = Meshes.create(
            [verts],
            [faces.verts_idx],
            textures=TexturesAtlas.create([aux.texture_atlas]),
        )
        R, T = look_at_view_transform(2.7, 0.0, 0.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        renderer = MeshRenderer(
            MeshRasterizer(
                cams,
                RasterizationSettings(
                    image_size=golden_size(512),
                    blur_radius=0.0,
                    faces_per_pixel=1,
                    cull_backfaces=True,
                ),
            ),
            HardPhongShader(
                cameras=cams,
                lights=PointLights.create(
                    location=jnp.asarray([[0.0, 0.0, 2.0]])
                ),
                materials=Materials.create(
                    specular_color=((0.0, 0.0, 0.0),), shininess=0.0
                ),
                blend_params=BlendParams(0.5, 1e-4, (1.0, 1.0, 1.0)),
            ),
        )
        rgb = np.asarray(renderer(mesh))[0, ..., :3]
        ref = _golden("test_texture_atlas_8x8_back_MeshRasterizer.png")
        mad = np.abs(rgb - ref).mean()
        assert mad < mad_tol(0.01), f"atlas: mad {mad}"
