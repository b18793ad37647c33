"""glTF cow: load the reference's cow.glb and match its rendered goldens
(reference tests/test_io_gltf.py:147 `test_load_cow`, :247
`test_load_cow_no_texture`) — exercises the glb loader, TexturesUV
sampling, and the Phong pipeline end-to-end.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.io import IO
from pytorch3d_tpu.renderer import (
    BlendParams,
    FoVPerspectiveCameras,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.shader import HardPhongShader
from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex

DATA = "/root/reference/tests/data"
GLB = os.path.join(DATA, "cow.glb")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GLB), reason="reference cow.glb not available"
)


def _render(mesh, azim=0.0):
    R, T = look_at_view_transform(3.0, 10.0, azim)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    renderer = MeshRenderer(
        MeshRasterizer(
            cams,
            RasterizationSettings(
                image_size=256, blur_radius=0.0, faces_per_pixel=1
            ),
        ),
        HardPhongShader(
            cameras=cams,
            lights=PointLights.create(
                location=jnp.asarray([[0.0, 0.0, 2.0]])
            ),
            blend_params=BlendParams(
                sigma=1e-1, gamma=1e-4, background_color=(1.0, 1.0, 1.0)
            ),
        ),
    )
    return np.asarray(renderer(mesh))[0, ..., :3]


def _golden(name):
    from PIL import Image

    with Image.open(os.path.join(DATA, name)) as f:
        return np.asarray(f, np.float32)[..., :3] / 255.0


class TestGlbCow:
    def test_load_shapes_and_render(self):
        mesh = IO().load_mesh(GLB)
        fm = np.asarray(mesh.faces_packed_mask())
        vm = np.asarray(mesh.verts_packed_mask())
        assert fm.sum() == 5856 and vm.sum() == 3225
        img = _render(mesh, azim=4.0)
        mad = np.abs(img - _golden("glb_cow.png")).mean()
        assert mad < 0.02, f"textured cow mad {mad}"

    def test_load_no_texture_gray_render(self):
        mesh = IO().load_mesh(GLB, include_textures=False)
        assert mesh.textures is None
        mesh = mesh.replace(
            textures=TexturesVertex(
                _verts_features_padded=0.5
                * jnp.ones_like(mesh.verts_padded())
            )
        )
        img = _render(mesh)
        mad = np.abs(img - _golden("glb_cow_gray.png")).mean()
        assert mad < 0.02, f"gray cow mad {mad}"
