"""Joined-scene renders vs the reference's shipped goldens
(reference tests/test_render_meshes.py:1171 `_joined_spheres`):
two offset ico spheres joined with join_meshes_as_scene, rendered at
512² with Phong/Gouraud/Flat (MeshRasterizer) and SplatterPhong
(MeshRasterizerOpenGL — the pairing the reference uses for its GL
golden).
"""

import os

import jax.numpy as jnp
import numpy as np

from golden_utils import golden_size, mad_tol, pool_golden
import pytest

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
from pytorch3d_tpu.renderer.mesh.rasterizer import MeshRasterizerOpenGL
from pytorch3d_tpu.renderer.mesh.shader import (
    HardFlatShader,
    HardGouraudShader,
    HardPhongShader,
    SplatterPhongShader,
)
from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex
from pytorch3d_tpu.structures import Meshes, join_meshes_as_scene
from pytorch3d_tpu.utils import ico_sphere

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference goldens not available"
)


def _joined_mesh():
    sphere_list = [ico_sphere(3), ico_sphere(4)]
    scales = [0.25, 1.0]
    offsets = [1.2, -0.3]
    adjusted = []
    for sph, sc, off in zip(sphere_list, scales, offsets):
        verts = np.asarray(sph.verts_padded()) * sc
        verts[0, :, 0] += off
        adjusted.append(
            Meshes.create(
                [jnp.asarray(verts[0])], [sph.faces_padded()[0]]
            )
        )
    joined = join_meshes_as_scene(adjusted)
    return joined.replace(
        textures=TexturesVertex(
            _verts_features_padded=jnp.ones_like(joined.verts_padded())
        )
    )


def _golden(name):
    from PIL import Image

    path = os.path.join(DATA, f"test_joined_spheres_{name}.png")
    return pool_golden(
        np.asarray(Image.open(path), np.float32)[..., :3] / 255.0
    )


@pytest.mark.parametrize(
    "name,shader_cls",
    [
        ("phong", HardPhongShader),
        ("gouraud", HardGouraudShader),
        ("flat", HardFlatShader),
        ("splatter", SplatterPhongShader),
    ],
)
def test_joined_spheres_matches_golden(name, shader_cls):
    mesh = _joined_mesh()
    R, T = look_at_view_transform(2.7, 0.0, 0.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    is_gl = name == "splatter"
    rs = RasterizationSettings(
        image_size=golden_size(512),
        blur_radius=0.0,
        faces_per_pixel=1,
        perspective_correct=True if is_gl else None,
    )
    rast_cls = MeshRasterizerOpenGL if is_gl else MeshRasterizer
    shader = shader_cls(
        cameras=cams,
        lights=PointLights.create(location=jnp.asarray([[0.0, 0.0, 2.0]])),
        materials=Materials.create(),
        blend_params=BlendParams(0.5, 1e-4, (0.0, 0.0, 0.0)),
    )
    rgb = np.asarray(
        MeshRenderer(rast_cls(cams, rs), shader)(mesh)
    )[0, ..., :3]
    ref = _golden(name)
    mad = np.abs(rgb - ref).mean()
    # reference's own tolerance is atol=0.05 per pixel; we report the mean
    assert mad < mad_tol(0.01), f"{name}: mean abs diff {mad}"
