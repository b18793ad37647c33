"""Non-square (rectangle) image rasterization invariants.

Port of reference tests/test_rasterize_rectangle_images.py: a mesh whose
NDC extent fits inside [-1, 1] covers the SAME pixel values (pix_to_face
occupancy, dists, zbuf, bary) when rasterized into an (H, W) rectangle
as into the (S, S) square with S = min(H, W) — the longer side only adds
empty margin in non-square NDC.  Vertex gradients must match too.
Both meshes and pointclouds, both H > W and W > H.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.renderer.mesh.rasterize_meshes import rasterize_meshes
from pytorch3d_tpu.renderer.points.rasterize_points import rasterize_points
from pytorch3d_tpu.structures import Meshes, Pointclouds

# a triangle comfortably inside the unit square (reference verts0)
VERTS = jnp.asarray(
    [[-0.7, -0.7, 1.0], [0.0, 0.7, 1.0], [0.7, -0.7, 1.0]], jnp.float32
)
FACES = jnp.asarray([[0, 1, 2]], jnp.int32)


def _mesh_frags(verts, image_size, blur):
    m = Meshes.create(verts=[verts], faces=[FACES])
    return rasterize_meshes(
        m, image_size=image_size, blur_radius=blur, faces_per_pixel=1,
        bin_size=0,
    )


class TestRectangleMeshes:
    @pytest.mark.parametrize("image_size", [(64, 128), (128, 64), (96, 160)])
    @pytest.mark.parametrize("blur", [0.0, 2e-2])
    def test_values_match_square(self, image_size, blur):
        H, W = image_size
        S = min(H, W)
        pf_s, zb_s, ba_s, di_s = _mesh_frags(VERTS, (S, S), blur)
        pf_r, zb_r, ba_r, di_r = _mesh_frags(VERTS, image_size, blur)

        mask_s = np.asarray(pf_s >= 0)
        mask_r = np.asarray(pf_r >= 0)
        assert mask_s.sum() == mask_r.sum() > 0
        np.testing.assert_allclose(
            np.asarray(di_s)[mask_s[..., 0]].ravel(),
            np.asarray(di_r)[mask_r[..., 0]].ravel(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(zb_s)[mask_s[..., 0]].ravel(),
            np.asarray(zb_r)[mask_r[..., 0]].ravel(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ba_s)[mask_s[..., 0]].ravel(),
            np.asarray(ba_r)[mask_r[..., 0]].ravel(),
            atol=2e-6,
        )

    @pytest.mark.parametrize("image_size", [(64, 128), (128, 64)])
    def test_grads_match_square(self, image_size):
        H, W = image_size
        S = min(H, W)
        blur = 2e-2

        base = Meshes.create(verts=[VERTS], faces=[FACES])

        def loss(verts, size):
            m = base.update_padded(verts[None])
            pf, zb, ba, di = rasterize_meshes(
                m, image_size=size, blur_radius=blur, faces_per_pixel=1,
                bin_size=0,
            )
            hit = pf >= 0
            zc = jnp.where(hit, zb, 0.0)
            dc = jnp.where(hit, di, 0.0)
            bc = jnp.where(hit[..., None], ba, 0.0)
            # fixed cotangent pattern, crop-invariant: weights depend
            # only on the face-relative values, not pixel positions
            return (
                jnp.sum(dc * 2.0) + jnp.sum(zc * 0.5) + jnp.sum(bc * 1.5)
            )

        g_sq = jax.grad(lambda v: loss(v, (S, S)))(VERTS)
        g_rect = jax.grad(lambda v: loss(v, image_size))(VERTS)
        np.testing.assert_allclose(
            np.asarray(g_sq), np.asarray(g_rect), rtol=3e-4, atol=5e-3
        )


class TestRectanglePoints:
    @pytest.mark.parametrize("image_size", [(64, 128), (128, 64)])
    def test_values_match_square(self, image_size):
        H, W = image_size
        S = min(H, W)
        pts = jnp.asarray(
            [[-0.3, 0.2, 1.0], [0.4, -0.1, 1.2], [0.0, 0.5, 0.8]],
            jnp.float32,
        )
        cloud = Pointclouds.create(points=[pts])
        idx_s, zb_s, d_s = rasterize_points(
            cloud, image_size=(S, S), radius=0.1, points_per_pixel=2,
            bin_size=0,
        )
        idx_r, zb_r, d_r = rasterize_points(
            cloud, image_size=image_size, radius=0.1, points_per_pixel=2,
            bin_size=0,
        )
        mask_s = np.asarray(idx_s >= 0)
        mask_r = np.asarray(idx_r >= 0)
        assert mask_s.sum() == mask_r.sum() > 0
        np.testing.assert_allclose(
            np.sort(np.asarray(zb_s)[mask_s].ravel()),
            np.sort(np.asarray(zb_r)[mask_r].ravel()),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(d_s)[mask_s].ravel()),
            np.sort(np.asarray(d_r)[mask_r].ravel()),
            atol=1e-6,
        )

    def test_image_size_arg_errors(self):
        cloud = Pointclouds.create(
            points=[jnp.zeros((1, 3), jnp.float32) + 0.5]
        )
        with pytest.raises(ValueError):
            rasterize_points(cloud, image_size=(0, 10), radius=0.1)


class TestRectangleMeshesErrors:
    def test_image_size_arg_errors(self):
        m = Meshes.create(verts=[VERTS], faces=[FACES])
        with pytest.raises(ValueError):
            rasterize_meshes(m, image_size=(64, -1))
