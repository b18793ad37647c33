"""Frustum clipping tests (reference tests/test_render_meshes_clipped.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    MeshRasterizer,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.clip import (
    clip_faces,
    convert_clipped_rasterization_to_original_faces,
)
from pytorch3d_tpu.utils import ico_sphere


class TestClipFaces:
    def _faces(self):
        return jnp.asarray(
            [
                [[0, 0, 1], [1, 0, 1], [0, 1, 1]],  # case 1: in front
                [[0, 0, -1], [1, 0, -1], [0, 1, -1]],  # case 2: behind
                [[0, 0, 1], [1, 0, -1], [0, 1, -1]],  # case 3: 2 behind
                [[0, 0, -1], [1, 0, 1], [0, 1, 1]],  # case 4: 1 behind
            ],
            jnp.float32,
        )

    def test_case_masks(self):
        c = clip_faces(self._faces(), jnp.ones((4,), bool), 0.1)
        np.testing.assert_array_equal(
            np.asarray(c.valid),
            [True, False, True, True, False, False, False, True],
        )

    def test_clipped_z_at_plane(self):
        c = clip_faces(self._faces(), jnp.ones((4,), bool), 0.1)
        fv = np.asarray(c.face_verts)
        # case 3 tri: one original vert (z=1), two at the plane
        np.testing.assert_allclose(sorted(fv[2][:, 2]), [0.1, 0.1, 1.0], atol=1e-5)
        # case 4 slot A: two original + one at plane; slot B: one + two
        np.testing.assert_allclose(sorted(fv[3][:, 2]), [0.1, 1.0, 1.0], atol=1e-5)
        np.testing.assert_allclose(sorted(fv[7][:, 2]), [0.1, 0.1, 1.0], atol=1e-5)

    def test_winding_preserved(self):
        faces = self._faces()
        c = clip_faces(faces, jnp.ones((4,), bool), 0.1)
        fv = np.asarray(c.face_verts)

        def area2d(tri):
            return (tri[1, 0] - tri[0, 0]) * (tri[2, 1] - tri[0, 1]) - (
                tri[1, 1] - tri[0, 1]
            ) * (tri[2, 0] - tri[0, 0])

        sign_orig = np.sign(area2d(np.asarray(faces)[3]))
        assert np.sign(area2d(fv[3])) == sign_orig
        assert np.sign(area2d(fv[7])) == sign_orig

    def test_bary_conversion(self):
        c = clip_faces(self._faces(), jnp.ones((4,), bool), 0.1)
        # a point at new-face vertex 0 of case-3 (the kept vert) maps to a
        # one-hot barycentric of the original kept vertex
        pix = jnp.asarray([[2]])  # case-3 slot id
        bary = jnp.asarray([[[1.0, 0.0, 0.0]]])
        pf, b = convert_clipped_rasterization_to_original_faces(pix, bary, c)
        assert int(pf[0, 0]) == 2
        assert np.asarray(b)[0, 0].max() == 1.0  # one-hot on original vert

    def test_render_from_inside(self):
        mesh = ico_sphere(2)
        R, T = look_at_view_transform(dist=0.5)  # camera inside the sphere
        cams = FoVPerspectiveCameras.create(R=R, T=T, znear=0.05)
        rast = MeshRasterizer(
            cams, RasterizationSettings(image_size=32, z_clip_value=0.1)
        )
        frags = rast(mesh)
        pf = np.asarray(frags.pix_to_face)
        assert (pf >= 0).sum() > 0
        assert pf.max() < mesh.max_faces  # ids mapped back to originals
        # all rendered depths in front of the clip plane
        z = np.asarray(frags.zbuf)
        assert z[pf >= 0].min() >= 0.1 - 1e-4

    def test_grad_through_clip(self):
        mesh = ico_sphere(1)
        R, T = look_at_view_transform(dist=0.7)
        cams = FoVPerspectiveCameras.create(R=R, T=T, znear=0.05)
        rast = MeshRasterizer(
            cams,
            RasterizationSettings(
                image_size=16, z_clip_value=0.1, blur_radius=1e-4,
                faces_per_pixel=2,
            ),
        )

        def loss(v):
            frags = rast(mesh.update_padded(v))
            return jnp.sum(jnp.where(frags.zbuf > 0, frags.zbuf, 0.0))

        g = jax.grad(loss)(mesh.verts_padded())
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
