"""Texture sampling parity vs the reference torch implementations.

TexturesUV.sample_textures (grid_sample conventions: align_corners,
padding, v-flip) and TexturesVertex/TexturesAtlas sampling compared on
IDENTICAL fragments (produced by the reference python rasterizer) —
round 1 only had render-level smoke tests for textures.
"""

import sys

import numpy as np

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def _quad_fragments(S=24):
    """Rasterize a textured quad with the reference python rasterizer."""
    from pytorch3d.renderer import (
        FoVOrthographicCameras,
        look_at_view_transform,
    )
    from pytorch3d.renderer.mesh.rasterize_meshes import (
        rasterize_meshes_python,
    )
    from pytorch3d.structures import Meshes as RefMeshes

    verts = torch.tensor(
        [
            [-0.7, -0.7, 1.0],
            [0.7, -0.7, 1.0],
            [0.7, 0.7, 1.0],
            [-0.7, 0.7, 1.0],
        ]
    )
    faces = torch.tensor([[0, 1, 2], [0, 2, 3]])
    R, T = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    cam = FoVOrthographicCameras(R=R, T=T)
    w2v = cam.get_world_to_view_transform()
    proj = cam.get_projection_transform().compose(
        cam.get_ndc_camera_transform()
    )
    vv = w2v.transform_points(verts[None])
    vndc = proj.transform_points(vv)
    vndc[..., 2] = vv[..., 2]
    mesh = RefMeshes(verts=[verts], faces=[faces]).update_padded(vndc)
    pix, zbuf, bary, dists = rasterize_meshes_python(
        mesh, S, 0.0, 1, cull_to_frustum=False
    )
    return verts, faces, pix, bary


class TestTexturesUVParity:
    def test_sample_textures_matches(self):
        from pytorch3d.renderer import TexturesUV as RefTexUV
        from pytorch3d.renderer.mesh.rasterizer import (
            Fragments as RefFragments,
        )

        from pytorch3d_tpu.renderer.mesh.rasterizer import Fragments
        from pytorch3d_tpu.renderer.mesh.textures import TexturesUV

        verts, faces, pix, bary = _quad_fragments()
        rng = np.random.RandomState(0)
        tex_map = rng.rand(16, 16, 3).astype(np.float32)
        verts_uvs = torch.tensor(
            [[0.05, 0.05], [0.95, 0.1], [0.9, 0.95], [0.1, 0.9]]
        )
        faces_uvs = torch.tensor([[0, 1, 2], [0, 2, 3]])

        ref_tex = RefTexUV(
            maps=[torch.tensor(tex_map)],
            faces_uvs=[faces_uvs],
            verts_uvs=[verts_uvs],
        )
        ref_frag = RefFragments(
            pix_to_face=pix,
            zbuf=torch.zeros_like(pix, dtype=torch.float32),
            bary_coords=bary,
            dists=None,
        )
        ref_tex._num_faces_per_mesh = [2]
        ref_texels = t2n(ref_tex.sample_textures(ref_frag))[0]

        my_tex = TexturesUV.create(
            maps=[jnp.asarray(tex_map)],
            faces_uvs=[jnp.asarray(t2n(faces_uvs), jnp.int32)],
            verts_uvs=[jnp.asarray(t2n(verts_uvs))],
        )
        my_frag = Fragments(
            pix_to_face=jnp.asarray(t2n(pix)),
            zbuf=jnp.zeros(pix.shape, jnp.float32),
            bary_coords=jnp.asarray(t2n(bary)),
            dists=jnp.zeros(pix.shape, jnp.float32),
        )

        class _M:
            textures = my_tex

        my_texels = np.asarray(my_tex.sample_textures(my_frag))[0]
        covered = t2n(pix)[0, ..., 0] >= 0
        np.testing.assert_allclose(
            my_texels[covered],
            ref_texels[covered],
            atol=2e-2,  # bilinear taps at half-texel boundaries
        )
        # interior pixels (away from texel boundaries) match tightly
        err = np.abs(my_texels[covered] - ref_texels[covered])
        assert np.median(err) < 2e-3


class TestTexturesVertexParity:
    def test_sample_matches(self):
        from pytorch3d.renderer import TexturesVertex as RefTexV
        from pytorch3d.renderer.mesh.rasterizer import (
            Fragments as RefFragments,
        )

        from pytorch3d_tpu.renderer.mesh.rasterizer import Fragments
        from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex

        verts, faces, pix, bary = _quad_fragments()
        rng = np.random.RandomState(1)
        feats = rng.rand(4, 3).astype(np.float32)

        ref_tex = RefTexV(verts_features=[torch.tensor(feats)])
        ref_tex._num_faces_per_mesh = [2]
        # reference sample_textures needs faces_packed passed via meshes;
        # use the functional path: interpolate manually
        from pytorch3d.ops import interpolate_face_attributes

        fv = torch.tensor(feats)[faces]
        ref_texels = t2n(
            interpolate_face_attributes(pix, bary, fv)
        )[0]

        my_tex = TexturesVertex(verts_features_padded=jnp.asarray(feats)[None])
        my_frag = Fragments(
            pix_to_face=jnp.asarray(t2n(pix)),
            zbuf=jnp.zeros(pix.shape, jnp.float32),
            bary_coords=jnp.asarray(t2n(bary)),
            dists=jnp.zeros(pix.shape, jnp.float32),
        )
        from pytorch3d_tpu.structures import Meshes

        mesh = Meshes.create(
            [jnp.asarray(t2n(verts))],
            [jnp.asarray(t2n(faces), jnp.int32)],
            textures=my_tex,
        )
        my_texels = np.asarray(mesh.sample_textures(my_frag))[0]
        covered = t2n(pix)[0, ..., 0] >= 0
        np.testing.assert_allclose(
            my_texels[covered], ref_texels[covered], atol=1e-5
        )
