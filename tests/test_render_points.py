"""Point rasterization / compositing / renderer tests
(reference tests/test_rasterize_points.py, test_render_points.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import (
    AlphaCompositor,
    FoVPerspectiveCameras,
    NormWeightedCompositor,
    PointsRasterizationSettings,
    PointsRasterizer,
    PointsRenderer,
    alpha_composite,
    look_at_view_transform,
    norm_weighted_sum,
    rasterize_points,
    weighted_sum,
)
from pytorch3d_tpu.structures import Pointclouds


class TestRasterizePoints:
    def test_single_point_center(self):
        # a point at NDC origin with z=1 covers the central pixels
        pts = np.zeros((1, 1, 3), np.float32)
        pts[0, 0] = [0.0, 0.0, 1.0]
        pc = Pointclouds.create(jnp.asarray(pts))
        idx, zbuf, dists = rasterize_points(
            pc, image_size=5, radius=0.3, points_per_pixel=2
        )
        idx = np.asarray(idx)
        assert idx[0, 2, 2, 0] == 0  # center pixel hit
        assert idx[0, 0, 0, 0] == -1  # corner not covered
        assert np.asarray(zbuf)[0, 2, 2, 0] == 1.0
        assert np.asarray(dists)[0, 2, 2, 0] < 0.3**2

    def test_z_ordering(self):
        pts = np.asarray(
            [[[0, 0, 2.0], [0, 0, 1.0], [0, 0, 3.0]]], np.float32
        )
        pc = Pointclouds.create(jnp.asarray(pts))
        idx, zbuf, _ = rasterize_points(
            pc, image_size=3, radius=0.9, points_per_pixel=3
        )
        np.testing.assert_array_equal(np.asarray(idx)[0, 1, 1], [1, 0, 2])
        np.testing.assert_allclose(np.asarray(zbuf)[0, 1, 1], [1, 2, 3])

    def test_negative_z_culled(self):
        pts = np.asarray([[[0, 0, -1.0]]], np.float32)
        pc = Pointclouds.create(jnp.asarray(pts))
        idx, _, _ = rasterize_points(pc, image_size=3, radius=0.9)
        assert (np.asarray(idx) == -1).all()

    def test_heterogeneous_offsets(self):
        pts = [
            np.asarray([[0, 0, 1.0]], np.float32),
            np.asarray([[0, 0, 1.0], [0.5, 0.5, 2.0]], np.float32),
        ]
        pc = Pointclouds.create(pts)
        idx, _, _ = rasterize_points(pc, image_size=5, radius=0.3)
        P = pc.max_points
        got = np.asarray(idx)[1, 2, 2, 0]
        assert got == P  # packed offset for cloud 1, point 0


class TestCompositing:
    def _setup(self):
        # 2 points, features, one pixel stack
        features = jnp.asarray([[0.8, 0.2], [0.1, 0.9]], jnp.float32).T  # (C=2, P=2)
        idx = jnp.asarray(np.full((1, 2, 1, 1), -1), jnp.int32)
        idx = idx.at[0, 0, 0, 0].set(0).at[0, 1, 0, 0].set(1)
        alphas = jnp.full((1, 2, 1, 1), 0.5)
        return idx, alphas, features

    def test_alpha_composite(self):
        idx, alphas, features = self._setup()
        out = alpha_composite(idx, alphas, features)  # (1, 2, 1, 1)
        # w0 = 0.5, w1 = 0.5 * 0.5 = 0.25
        ref = 0.5 * np.asarray([0.8, 0.2]) + 0.25 * np.asarray([0.1, 0.9])
        np.testing.assert_allclose(np.asarray(out)[0, :, 0, 0], ref, rtol=1e-5)

    def test_weighted_sum(self):
        idx, alphas, features = self._setup()
        out = weighted_sum(idx, alphas, features)
        ref = 0.5 * np.asarray([0.8, 0.2]) + 0.5 * np.asarray([0.1, 0.9])
        np.testing.assert_allclose(np.asarray(out)[0, :, 0, 0], ref, rtol=1e-5)

    def test_norm_weighted_sum(self):
        idx, alphas, features = self._setup()
        out = norm_weighted_sum(idx, alphas, features)
        ref = 0.5 * np.asarray([0.8, 0.2]) + 0.5 * np.asarray([0.1, 0.9])
        np.testing.assert_allclose(np.asarray(out)[0, :, 0, 0], ref, rtol=1e-5)

    def test_empty_pixels_zero(self):
        features = jnp.ones((3, 4), jnp.float32)
        idx = jnp.full((1, 2, 2, 2), -1, jnp.int32)
        alphas = jnp.ones((1, 2, 2, 2))
        out = alpha_composite(idx, alphas, features)
        assert (np.asarray(out) == 0).all()


class TestPointsRenderer:
    def test_render_sphere_cloud(self):
        # random points on a sphere, rendered with a camera
        rng = np.random.RandomState(0)
        v = rng.randn(500, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        feats = (v * 0.5 + 0.5).astype(np.float32)  # color by position
        pc = Pointclouds.create(
            jnp.asarray(v[None]), features=jnp.asarray(feats[None])
        )
        R, T = look_at_view_transform(dist=3.0, elev=0.0, azim=0.0)
        cameras = FoVPerspectiveCameras.create(R=R, T=T)
        raster_settings = PointsRasterizationSettings(
            image_size=64, radius=0.05, points_per_pixel=4
        )
        renderer = PointsRenderer(
            rasterizer=PointsRasterizer(cameras, raster_settings),
            compositor=AlphaCompositor(background_color=(0.0, 0.0, 0.0)),
        )
        images = renderer(pc)
        img = np.asarray(images)[0]
        assert img.shape == (64, 64, 3)
        # the sphere projects to a central disk: lots of coverage inside,
        # empty corners
        assert (img.sum(-1) > 0).sum() > 500
        assert img[0, 0].sum() == 0
        assert np.isfinite(img).all()

    def test_grad_to_points(self):
        v = jnp.asarray(
            np.random.RandomState(1).randn(1, 50, 3) * 0.3, jnp.float32
        )
        feats = jnp.ones((1, 50, 3), jnp.float32)
        R, T = look_at_view_transform(dist=3.0)
        cameras = FoVPerspectiveCameras.create(R=R, T=T)
        rs = PointsRasterizationSettings(image_size=32, radius=0.1,
                                         points_per_pixel=4)

        def loss(pts):
            pc = Pointclouds.create(pts, features=feats)
            renderer = PointsRenderer(
                rasterizer=PointsRasterizer(cameras, rs),
                compositor=NormWeightedCompositor(),
            )
            return jnp.sum(renderer(pc))

        g = jax.grad(loss)(v)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestPointsGoldens:
    """Renders vs the reference's shipped point goldens
    (reference tests/test_render_points.py:54 test_simple_sphere)."""

    def test_simple_pointcloud_sphere_golden(self):
        import os

        import pytest
        from PIL import Image

        from pytorch3d_tpu.utils import ico_sphere

        golden = "/root/reference/tests/data/test_simple_pointcloud_sphere.png"
        if not os.path.isfile(golden):
            pytest.skip("reference goldens not available")
        verts = np.array(ico_sphere(1).verts_padded())
        verts[..., 0] += 0.2
        verts[..., 1] += 0.2
        pc = Pointclouds.create(
            jnp.asarray(verts), features=jnp.ones_like(jnp.asarray(verts))
        )
        R, T = look_at_view_transform(2.7, 0.0, 0.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        renderer = PointsRenderer(
            PointsRasterizer(
                cams,
                PointsRasterizationSettings(
                    image_size=256, radius=5e-2, points_per_pixel=1
                ),
            ),
            NormWeightedCompositor(),
        )
        rgb = np.asarray(renderer(pc))[0, ..., :3]
        ref = (
            np.asarray(Image.open(golden), np.float32)[..., :3] / 255.0
        )
        mad = np.abs(rgb - ref).mean()
        assert mad < 0.01, f"points sphere: mad {mad}"


class TestSortedBinningEquivalence:
    """The O(P log) sort-based binning must produce bit-identical
    per-tile id lists to the exact top_k binning (ascending point id per
    tile, lowest ids kept on overflow) across radii/aspect regimes."""

    def test_ids_match_topk(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pytorch3d_tpu.renderer.points import (
            rasterize_points_pallas as rpp,
        )

        for trial, (P, rlo, rhi, size) in enumerate(
            [
                (2000, 0.005, 0.02, (256, 256)),
                (1500, 0.01, 0.3, (128, 256)),  # big spheres, many tiles
                (300, 0.0, 0.0, (64, 64)),      # zero radius
                (1000, 0.05, 0.05, (100, 200)),  # ragged tiles
            ]
        ):
            key = jax.random.PRNGKey(trial)
            k1, k2 = jax.random.split(key)
            pts = jax.random.uniform(k1, (P, 3), minval=-1.2, maxval=1.2)
            pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) * 2 - 0.2)
            rad = jax.random.uniform(k2, (P,), minval=rlo, maxval=rhi)
            valid = jnp.arange(P) % 7 != 0
            oy, ox, ok, n_ty, n_tx = rpp._tile_axis_masks(
                pts, rad, valid, size, (32, 128)
            )
            t = rpp.required_tiles_per_point(pts, rad, valid, size)
            mtpp = (max(int(t[0]), 1), max(int(t[1]), 1))
            for mpt in (64, 1024):
                a = rpp._ids_topk(oy, ox, ok, n_ty, n_tx, P, mpt)
                b = rpp._ids_sorted(
                    oy, ox, ok, n_ty, n_tx, P, min(mpt, P), mtpp
                )
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"trial={trial} mpt={mpt}",
                )
