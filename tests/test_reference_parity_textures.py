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

        my_tex = TexturesVertex.create(jnp.asarray(feats)[None])
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


class TestTexturesAPIParity:
    """The list/padded accessors, faces_verts_textures_packed,
    centers_for_image, and extend — vs the reference textures classes
    (pure torch, renderer/mesh/textures.py)."""

    def _uv_pair(self, seed=0):
        from pytorch3d.renderer.mesh.textures import TexturesUV as RefUV

        from pytorch3d_tpu.renderer import TexturesUV

        rng = np.random.RandomState(seed)
        maps = [rng.rand(8, 6, 3).astype(np.float32),
                rng.rand(8, 6, 3).astype(np.float32)]
        verts_uvs = [rng.rand(5, 2).astype(np.float32),
                     rng.rand(7, 2).astype(np.float32)]
        faces_uvs = [
            rng.randint(0, 5, (4, 3)).astype(np.int64),
            rng.randint(0, 7, (6, 3)).astype(np.int64),
        ]
        ours = TexturesUV.create(
            maps=[jnp.asarray(m) for m in maps],
            faces_uvs=[jnp.asarray(f) for f in faces_uvs],
            verts_uvs=[jnp.asarray(v) for v in verts_uvs],
        )
        ref = RefUV(
            maps=[torch.from_numpy(m) for m in maps],
            faces_uvs=[torch.from_numpy(f) for f in faces_uvs],
            verts_uvs=[torch.from_numpy(v) for v in verts_uvs],
            align_corners=True,
            padding_mode="border",
        )
        return ours, ref

    def test_uv_accessors(self):
        ours, ref = self._uv_pair()
        for o, r in zip(ours.maps_list(), ref.maps_list()):
            np.testing.assert_allclose(np.asarray(o), t2n(r))
        for o, r in zip(ours.verts_uvs_list(), ref.verts_uvs_list()):
            np.testing.assert_allclose(np.asarray(o), t2n(r))
        for o, r in zip(ours.faces_uvs_list(), ref.faces_uvs_list()):
            np.testing.assert_array_equal(np.asarray(o), t2n(r))
        # padded accessors agree on the valid prefixes
        op = np.asarray(ours.verts_uvs_padded())
        rp = t2n(ref.verts_uvs_padded())
        np.testing.assert_allclose(op[0, :5], rp[0, :5])
        assert ours.maps_ids_padded() is None

    def test_uv_faces_verts_textures_packed(self):
        ours, ref = self._uv_pair(3)
        got = np.asarray(ours.faces_verts_textures_packed())
        want = t2n(ref.faces_verts_textures_packed())
        # ours is over padded faces (4+2pad, 6); select valid rows
        valid = np.concatenate([np.arange(4), 6 + np.arange(6)])
        np.testing.assert_allclose(
            got[valid], want, rtol=1e-4, atol=1e-5
        )

    def test_uv_centers_for_image(self):
        from pytorch3d.renderer.mesh.textures import TexturesUV as RefUV

        from pytorch3d_tpu.renderer import TexturesUV

        rng = np.random.RandomState(5)
        maps = rng.rand(8, 6, 3).astype(np.float32)
        verts_uvs = rng.rand(5, 2).astype(np.float32)
        faces_uvs = rng.randint(0, 5, (4, 3)).astype(np.int64)
        ours = TexturesUV.create(
            maps=jnp.asarray(maps)[None],
            faces_uvs=[jnp.asarray(faces_uvs)],
            verts_uvs=[jnp.asarray(verts_uvs)],
        )
        ref = RefUV(
            maps=torch.from_numpy(maps)[None],
            faces_uvs=[torch.from_numpy(faces_uvs)],
            verts_uvs=[torch.from_numpy(verts_uvs)],
        )
        np.testing.assert_allclose(
            np.asarray(ours.centers_for_image(0)),
            t2n(ref.centers_for_image(0)),
            rtol=1e-4,
            atol=1e-4,
        )

    def test_vertex_accessors_and_extend(self):
        from pytorch3d.renderer.mesh.textures import (
            TexturesVertex as RefVertex,
        )

        from pytorch3d_tpu.renderer import TexturesVertex

        rng = np.random.RandomState(7)
        feats = [rng.rand(4, 3).astype(np.float32),
                 rng.rand(6, 3).astype(np.float32)]
        ours = TexturesVertex.create([jnp.asarray(f) for f in feats])
        ref = RefVertex(verts_features=[torch.from_numpy(f) for f in feats])
        for o, r in zip(
            ours.verts_features_list(), ref.verts_features_list()
        ):
            np.testing.assert_allclose(np.asarray(o), t2n(r))
        ours2, ref2 = ours.extend(2), ref.extend(2)
        assert len(ours2.verts_features_list()) == 4
        for o, r in zip(
            ours2.verts_features_list(), ref2.verts_features_list()
        ):
            np.testing.assert_allclose(np.asarray(o), t2n(r))
        sub_o = ours[[1]]
        sub_r = ref[[1]]
        np.testing.assert_allclose(
            np.asarray(sub_o.verts_features_list()[0]),
            t2n(sub_r.verts_features_list()[0]),
        )

    def test_atlas_accessors_and_packed_corners(self):
        from pytorch3d.renderer.mesh.textures import (
            TexturesAtlas as RefAtlas,
        )

        from pytorch3d_tpu.renderer import TexturesAtlas

        rng = np.random.RandomState(9)
        atl = [rng.rand(4, 4, 4, 3).astype(np.float32),
               rng.rand(2, 4, 4, 3).astype(np.float32)]
        ours = TexturesAtlas.create([jnp.asarray(a) for a in atl])
        ref = RefAtlas(atlas=[torch.from_numpy(a) for a in atl])
        for o, r in zip(ours.atlas_list(), ref.atlas_list()):
            np.testing.assert_allclose(np.asarray(o), t2n(r))
        got = np.asarray(ours.faces_verts_textures_packed())
        want = t2n(ref.faces_verts_textures_packed())
        valid = np.concatenate([np.arange(4), 4 + np.arange(2)])
        np.testing.assert_allclose(got[valid], want, rtol=1e-5, atol=1e-6)

    def test_vertex_submeshes(self):
        from pytorch3d.renderer.mesh.textures import (
            TexturesVertex as RefVertex,
        )

        from pytorch3d_tpu.renderer import TexturesVertex

        rng = np.random.RandomState(11)
        feats = [rng.rand(6, 3).astype(np.float32)]
        ids = np.array([1, 3, 4])
        ours = TexturesVertex.create([jnp.asarray(feats[0])]).submeshes(
            [[jnp.asarray(ids)]], [[jnp.asarray([0])]]
        )
        ref = RefVertex(
            verts_features=[torch.from_numpy(feats[0])]
        ).submeshes([[torch.from_numpy(ids)]], [[torch.tensor([0])]])
        np.testing.assert_allclose(
            np.asarray(ours.verts_features_list()[0]),
            t2n(ref.verts_features_list()[0]),
        )
