"""Texture lifecycle + join_scene edge coverage (VERDICT r4 directive #8;
models reference tests/test_texturing.py: clone/extend/getitem/error and
the join_scene map-packing block at :1272-1325)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    HardPhongShader,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.textures import (
    TexturesAtlas,
    TexturesUV,
    TexturesVertex,
)
from pytorch3d_tpu.structures import Meshes, join_meshes_as_scene
from pytorch3d_tpu.utils import ico_sphere


def _quad(offset_x: float):
    verts = jnp.asarray(
        [
            [-0.4 + offset_x, -0.4, 0.0],
            [0.4 + offset_x, -0.4, 0.0],
            [0.4 + offset_x, 0.4, 0.0],
            [-0.4 + offset_x, 0.4, 0.0],
        ],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


def _uv_quad_mesh(offset_x: float, color):
    verts, faces = _quad(offset_x)
    maps = jnp.broadcast_to(
        jnp.asarray(color, jnp.float32), (8, 8, 3)
    )[None]
    verts_uvs = jnp.asarray(
        [[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9]], jnp.float32
    )[None]
    faces_uvs = faces[None]
    tex = TexturesUV.create(maps, faces_uvs, verts_uvs)
    return Meshes.create(verts[None], faces[None]).replace(textures=tex)


def _render(mesh, image_size=96):
    R, T = look_at_view_transform(dist=2.5, elev=0.0, azim=0.0)
    cameras = FoVPerspectiveCameras.create(R=R, T=T, fov=60.0)
    renderer = MeshRenderer(
        MeshRasterizer(
            cameras,
            RasterizationSettings(image_size=image_size, faces_per_pixel=1),
        ),
        HardPhongShader(
            cameras=cameras,
            lights=PointLights.create(
                ambient_color=[[1.0, 1.0, 1.0]],
                diffuse_color=[[0.0, 0.0, 0.0]],
                specular_color=[[0.0, 0.0, 0.0]],
                location=[[0.0, 0.0, -3.0]],
            ),
        ),
    )
    return np.asarray(renderer(mesh, cameras=cameras))


class TestJoinSceneUV:
    def test_two_maps_keep_their_colors(self):
        """join_meshes_as_scene packs UV maps side by side; each mesh
        must keep sampling ITS OWN map (reference test_texturing.py
        join_scene tests)."""
        red = _uv_quad_mesh(-0.55, (0.9, 0.1, 0.1))
        blue = _uv_quad_mesh(0.55, (0.1, 0.1, 0.9))
        scene = join_meshes_as_scene([red, blue])
        img = _render(scene)[0]
        H, W = img.shape[:2]
        left = img[H // 2, W // 4]
        right = img[H // 2, 3 * W // 4]
        assert left[0] > 0.6 and left[2] < 0.3, left
        assert right[2] > 0.6 and right[0] < 0.3, right

    def test_join_matches_individual_renders(self):
        """Pixels covered by one mesh must match that mesh rendered
        alone (same geometry, packed-map indirection only)."""
        red = _uv_quad_mesh(-0.55, (0.8, 0.2, 0.3))
        blue = _uv_quad_mesh(0.55, (0.2, 0.7, 0.4))
        scene = join_meshes_as_scene([red, blue])
        img_scene = _render(scene)[0]
        img_red = _render(red)[0]
        covered = img_red[..., 3] > 0.5
        assert covered.sum() > 50
        diff = np.abs(img_scene[..., :3] - img_red[..., :3])[covered]
        assert diff.max() < 0.02, diff.max()

    def test_all_identical_maps(self):
        """Reference test_all_identical: joining meshes that share one
        map must still sample correctly."""
        m1 = _uv_quad_mesh(-0.55, (0.5, 0.5, 0.5))
        m2 = _uv_quad_mesh(0.55, (0.5, 0.5, 0.5))
        scene = join_meshes_as_scene([m1, m2])
        img = _render(scene)[0]
        cov = img[..., 3] > 0.5
        vals = img[..., :3][cov]
        assert np.abs(vals - 0.5).max() < 0.02


class TestLifecycle:
    def test_uv_extend_getitem_roundtrip(self):
        mesh = _uv_quad_mesh(0.0, (0.3, 0.6, 0.9))
        tex = mesh.textures
        ext = tex.extend(3)
        assert ext.maps_padded().shape[0] == 3
        sub = ext[1]
        np.testing.assert_allclose(
            np.asarray(sub.maps_padded()[0]),
            np.asarray(tex.maps_padded()[0]),
        )
        np.testing.assert_allclose(
            np.asarray(sub.verts_uvs_padded()[0]),
            np.asarray(tex.verts_uvs_padded()[0]),
        )

    def test_atlas_extend_getitem_roundtrip(self):
        atlas = jnp.linspace(0, 1, 2 * 4 * 4 * 3).reshape(1, 2, 4, 4, 3)
        tex = TexturesAtlas.create(atlas)
        ext = tex.extend(2)
        assert ext.atlas_padded().shape[0] == 2
        np.testing.assert_allclose(
            np.asarray(ext[1].atlas_padded()[0]), np.asarray(atlas[0])
        )

    def test_vertex_extend_getitem_roundtrip(self):
        feats = jnp.linspace(0, 1, 4 * 3).reshape(1, 4, 3)
        tex = TexturesVertex.create(feats)
        ext = tex.extend(4)
        np.testing.assert_allclose(
            np.asarray(ext[2].verts_features_padded()[0]),
            np.asarray(feats[0]),
        )

    def test_faces_verts_textures_packed_after_extend(self):
        """The packed per-face-vertex colors must replicate across the
        extended batch (reference test_extend)."""
        mesh = _uv_quad_mesh(0.0, (0.2, 0.4, 0.8))
        base = np.asarray(mesh.textures.faces_verts_textures_packed())
        ext = mesh.extend(2)
        packed = np.asarray(ext.textures.faces_verts_textures_packed())
        assert packed.shape[0] == 2 * base.shape[0]
        np.testing.assert_allclose(packed[: base.shape[0]], base)
        np.testing.assert_allclose(packed[base.shape[0] :], base)


class TestErrors:
    def test_vertex_wrong_rank(self):
        with pytest.raises(ValueError):
            TexturesVertex.create(jnp.ones((4, 3)))

    def test_atlas_wrong_rank(self):
        with pytest.raises(ValueError):
            TexturesAtlas.create(jnp.ones((1, 4, 4)))

    def test_uv_wrong_rank(self):
        with pytest.raises(ValueError):
            TexturesUV.create(
                jnp.ones((8, 8, 3)),  # missing batch dim
                jnp.zeros((1, 2, 3), jnp.int32),
                jnp.ones((1, 4, 2)),
            )

    def test_uv_batch_mismatch(self):
        with pytest.raises(ValueError):
            TexturesUV.create(
                jnp.ones((2, 8, 8, 3)),
                jnp.zeros((1, 2, 3), jnp.int32),
                jnp.ones((1, 4, 2)),
            )

    def test_mesh_textures_batch_mismatch(self):
        """Meshes with a textures batch != mesh batch must fail at
        construction or at sampling (reference Meshes+textures checks)."""
        verts, faces = _quad(0.0)
        tex = TexturesVertex.create(jnp.ones((2, 4, 3)))
        with pytest.raises((ValueError, AssertionError)):
            mesh = Meshes.create(verts[None], faces[None]).replace(
                textures=tex
            )
            # force use if construction was permissive
            mesh.textures.faces_verts_textures_packed(
                mesh.faces_packed()
            )
            raise ValueError("batch mismatch accepted silently")


class TestSphereUVSeam:
    def test_uv_sphere_render_finite_and_covered(self):
        """A UV-textured sphere with a wrapping checker map renders
        finite colors everywhere (seam/border handling)."""
        mesh = ico_sphere(2)
        V = mesh.verts_padded().shape[1]
        v = mesh.verts_padded()[0]
        theta = jnp.arctan2(v[:, 0], v[:, 2])
        phi = jnp.arccos(jnp.clip(v[:, 1], -1, 1))
        uv = jnp.stack(
            [(theta / (2 * jnp.pi)) + 0.5, phi / jnp.pi], axis=1
        )
        checker = (
            (jnp.arange(16)[:, None] // 2 + jnp.arange(16)[None] // 2) % 2
        ).astype(jnp.float32)
        maps = jnp.stack([checker] * 3, axis=-1)[None]
        tex = TexturesUV.create(
            maps, mesh.faces_padded(), uv[None]
        )
        img = _render(mesh.replace(textures=tex))[0]
        assert np.isfinite(img).all()
        assert (img[..., 3] > 0.5).sum() > 500
