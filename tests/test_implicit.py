"""Implicit rendering stack tests: harmonic embedding, raysamplers,
raymarchers, sample_pdf, ImplicitRenderer/VolumeRenderer, NeRF model
(reference tests/test_raysampling.py, test_raymarching.py,
test_sample_pdf.py, projects/nerf tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import FoVPerspectiveCameras, look_at_view_transform
from pytorch3d_tpu.renderer.implicit import (
    AbsorptionOnlyRaymarcher,
    EmissionAbsorptionRaymarcher,
    HarmonicEmbedding,
    ImplicitRenderer,
    MonteCarloRaysampler,
    NDCMultinomialRaysampler,
    RayBundle,
    VolumeRenderer,
    VolumeSampler,
    ray_bundle_to_ray_points,
    sample_pdf,
)
from pytorch3d_tpu.structures import Volumes


def _cameras(b=1, dist=2.7):
    R, T = look_at_view_transform(dist=dist, elev=0.0, azim=0.0)
    if b > 1:
        R = jnp.tile(R, (b, 1, 1))
        T = jnp.tile(T, (b, 1))
    return FoVPerspectiveCameras.create(R=R, T=T, znear=0.1, zfar=10.0)


class TestHarmonicEmbedding:
    def test_shapes_and_values(self):
        he = HarmonicEmbedding(n_harmonic_functions=2, append_input=True)
        x = jnp.asarray([[0.5, 0.0, 0.25]])
        out = he(x)
        assert out.shape == (1, he.get_output_dim(3))
        # first harmonics are sin(x), then sin(2x)
        np.testing.assert_allclose(
            np.asarray(out)[0, 0], np.sin(0.5), rtol=1e-6
        )

    def test_no_append(self):
        he = HarmonicEmbedding(n_harmonic_functions=3, append_input=False)
        assert he(jnp.ones((4, 3))).shape == (4, 18)


class TestRaysamplers:
    def test_grid_sampler_shapes(self):
        cams = _cameras()
        rs = NDCMultinomialRaysampler(
            image_width=8, image_height=6, n_pts_per_ray=5,
            min_depth=1.0, max_depth=3.0,
        )
        bundle = rs(cams)
        assert bundle.origins.shape == (1, 6, 8, 3)
        assert bundle.directions.shape == (1, 6, 8, 3)
        assert bundle.lengths.shape == (1, 6, 8, 5)
        assert bundle.xys.shape == (1, 6, 8, 2)
        pts = ray_bundle_to_ray_points(bundle)
        assert pts.shape == (1, 6, 8, 5, 3)

    def test_rays_through_origin(self):
        # center ray from a camera at (0,0,-2.7) looking at origin passes
        # close to the origin at depth 2.7
        cams = _cameras()
        rs = NDCMultinomialRaysampler(
            image_width=9, image_height=9, n_pts_per_ray=1,
            min_depth=2.7, max_depth=2.7,
        )
        bundle = rs(cams)
        pts = ray_bundle_to_ray_points(bundle)  # (1, 9, 9, 1, 3)
        center = np.asarray(pts)[0, 4, 4, 0]
        np.testing.assert_allclose(center, [0, 0, 0], atol=1e-5)

    def test_mc_sampler(self):
        cams = _cameras(b=2)
        rs = MonteCarloRaysampler(
            min_x=-1, max_x=1, min_y=-1, max_y=1,
            n_rays_per_image=32, n_pts_per_ray=4,
            min_depth=1.0, max_depth=2.0,
        )
        bundle = rs(cams, key=jax.random.PRNGKey(3))
        assert bundle.origins.shape == (2, 32, 3)
        assert bundle.lengths.shape == (2, 32, 4)
        xys = np.asarray(bundle.xys)
        assert (xys >= -1).all() and (xys <= 1).all()

    def test_masked_sampling(self):
        cams = _cameras()
        rs = NDCMultinomialRaysampler(
            image_width=8, image_height=8, n_pts_per_ray=2,
            min_depth=1.0, max_depth=2.0, n_rays_per_image=16,
        )
        mask = jnp.zeros((1, 8, 8)).at[:, :, :2].set(1.0)
        bundle = rs(cams, mask=mask, key=jax.random.PRNGKey(0))
        # all sampled xys must come from the masked (left) columns
        grid_xys = np.asarray(rs._xy_grid)  # (8, 8, 2)
        allowed = set(map(tuple, grid_xys[:, :2].reshape(-1, 2).round(5).tolist()))
        got = np.asarray(bundle.xys).reshape(-1, 2).round(5)
        assert all(tuple(g) in allowed for g in got)


class TestRaymarchers:
    def test_ea_uniform(self):
        d = jnp.full((2, 4, 10, 1), 0.5)
        f = jnp.ones((2, 4, 10, 3))
        out = EmissionAbsorptionRaymarcher()(d, f)
        assert out.shape == (2, 4, 4)
        # weights sum: 1 - 0.5^10; features were all ones
        np.testing.assert_allclose(
            np.asarray(out)[..., 0], 1 - 0.5**10, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out)[..., 3], 1 - 0.5**10, rtol=1e-4
        )

    def test_absorption_only(self):
        d = jnp.full((2, 5, 1), 0.1)
        out = AbsorptionOnlyRaymarcher()(d)
        np.testing.assert_allclose(np.asarray(out), 1 - 0.9**5, rtol=1e-5)


class TestSamplePdf:
    def test_uniform_weights(self):
        bins = jnp.linspace(0, 1, 11)[None].repeat(3, 0)  # (3, 11)
        w = jnp.ones((3, 10))
        s = sample_pdf(bins, w, 100, det=True)
        assert s.shape == (3, 100)
        # uniform pdf -> samples approximately uniform
        np.testing.assert_allclose(float(s.mean()), 0.5, atol=0.02)

    def test_concentrated_weights(self):
        bins = jnp.linspace(0, 1, 11)[None]
        w = jnp.zeros((1, 10)).at[0, 5].set(100.0)
        s = sample_pdf(bins, w, 50, det=True, key=jax.random.PRNGKey(0))
        # nearly all samples in bin [0.5, 0.6]
        frac = ((np.asarray(s) >= 0.5) & (np.asarray(s) <= 0.6)).mean()
        assert frac > 0.9


class TestImplicitRenderer:
    def test_sphere_density_render(self):
        cams = _cameras()
        raysampler = NDCMultinomialRaysampler(
            image_width=16, image_height=16, n_pts_per_ray=32,
            min_depth=1.0, max_depth=4.0,
        )
        renderer = ImplicitRenderer(
            raysampler, EmissionAbsorptionRaymarcher()
        )

        def vol_fn(ray_bundle, **kwargs):
            pts = ray_bundle_to_ray_points(ray_bundle)
            inside = jnp.linalg.norm(pts, axis=-1) < 0.5
            dens = inside.astype(jnp.float32)[..., None] * 0.9
            feats = jnp.broadcast_to(
                jnp.asarray([1.0, 0.0, 0.0]), pts.shape[:-1] + (3,)
            )
            return dens, feats

        images, bundle = renderer(cameras=cams, volumetric_function=vol_fn)
        img = np.asarray(images)[0]  # (16, 16, 4)
        assert img.shape == (16, 16, 4)
        # center hits the sphere (red, opaque); corner doesn't
        assert img[8, 8, 0] > 0.9 and img[8, 8, 3] > 0.9
        assert img[0, 0, 3] < 1e-3


class TestVolumeRenderer:
    def test_dense_volume(self):
        B, S = 1, 24
        densities = jnp.zeros((B, 1, 16, 16, 16))
        # opaque central blob
        densities = densities.at[:, :, 6:10, 6:10, 6:10].set(0.8)
        colors = jnp.zeros((B, 3, 16, 16, 16)).at[:, 1].set(1.0)  # green
        vols = Volumes.create(densities=densities, features=colors, voxel_size=0.1)
        cams = _cameras()
        raysampler = NDCMultinomialRaysampler(
            image_width=12, image_height=12, n_pts_per_ray=S,
            min_depth=1.5, max_depth=4.0,
        )
        renderer = VolumeRenderer(raysampler, EmissionAbsorptionRaymarcher())
        images, _ = renderer(cameras=cams, volumes=vols)
        img = np.asarray(images)[0]
        assert img.shape == (12, 12, 4)
        assert img[6, 6, 1] > 0.1  # green at center
        assert img[0, 0, 3] < 1e-3


class TestNeRFModel:
    def test_train_step_improves(self):
        import optax

        from pytorch3d_tpu.models import RadianceFieldRenderer
        from pytorch3d_tpu.parallel import make_nerf_train_step

        model = RadianceFieldRenderer(
            image_width=16, image_height=16,
            n_pts_per_ray=8, n_pts_per_ray_fine=8, n_rays_per_image=64,
            min_depth=0.5, max_depth=4.0,
            n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
            n_layers_xyz=2, append_xyz=(1,),
        )
        cams = _cameras()
        image = jnp.ones((1, 16, 16, 3)) * jnp.asarray([0.2, 0.5, 0.8])
        key = jax.random.PRNGKey(0)
        params = model.init(jax.random.PRNGKey(1), cams, image=image, key=key)
        optimizer = optax.adam(5e-3)
        opt_state = optimizer.init(params)
        step = make_nerf_train_step(model, optimizer)

        losses = []
        for i in range(30):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(
                params, opt_state, cams, image, sub
            )
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestHeterogeneousSampling:
    """n_rays_total packed sampling (reference raysampling.py:199, :375;
    static-shape variant: per-ray camera_ids + full-length camera_counts)."""

    def _cams3(self):
        R, T = look_at_view_transform(
            dist=2.7,
            elev=jnp.asarray([0.0, 10.0, 20.0]),
            azim=jnp.asarray([0.0, 30.0, 60.0]),
        )
        return FoVPerspectiveCameras.create(R=R, T=T)

    def test_grid_n_rays_total(self):
        from pytorch3d_tpu.renderer.implicit.utils import HeterogeneousRayBundle

        cams = self._cams3()
        s = NDCMultinomialRaysampler(
            image_width=8, image_height=8, n_pts_per_ray=4,
            min_depth=1.0, max_depth=4.0, n_rays_total=16,
        )
        b = s(cams, key=jax.random.PRNGKey(1))
        assert isinstance(b, HeterogeneousRayBundle)
        assert b.origins.shape == (16, 1, 3)
        assert b.lengths.shape == (16, 1, 4)
        assert b.xys.shape == (16, 1, 2)
        assert b.camera_ids.shape == (16,)
        assert b.camera_counts.shape == (3,)
        assert int(b.camera_counts.sum()) == 16
        # each packed ray originates at its sampled camera's center
        centers = cams.get_camera_center()
        assert np.allclose(
            np.asarray(b.origins[:, 0]),
            np.asarray(centers[b.camera_ids]),
            atol=1e-5,
        )

    def test_grid_n_rays_total_masked(self):
        cams = self._cams3()
        s = NDCMultinomialRaysampler(
            image_width=8, image_height=8, n_pts_per_ray=4,
            min_depth=1.0, max_depth=4.0, n_rays_total=32,
        )
        mask = jnp.zeros((3, 8, 8)).at[:, :2, :2].set(1.0)
        b = s(cams, mask=mask, key=jax.random.PRNGKey(2))
        # all sampled xys must come from the 2x2 masked corner (4 grid points)
        uniq = {
            (round(float(x), 4), round(float(y), 4))
            for x, y in np.asarray(b.xys.reshape(-1, 2))
        }
        assert len(uniq) <= 4

    def test_mc_n_rays_total(self):
        from pytorch3d_tpu.renderer.implicit.utils import HeterogeneousRayBundle

        cams = self._cams3()
        mc = MonteCarloRaysampler(
            -1.0, 1.0, -1.0, 1.0, n_rays_per_image=4, n_pts_per_ray=4,
            min_depth=1.0, max_depth=4.0, n_rays_total=10,
        )
        b = mc(cams, key=jax.random.PRNGKey(3))
        assert isinstance(b, HeterogeneousRayBundle)
        assert b.origins.shape == (10, 1, 3)
        assert int(b.camera_counts.sum()) == 10

    def test_implicitron_n_rays_total_training(self):
        from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode
        from pytorch3d_tpu.implicitron.models.renderer.ray_sampler import (
            AdaptiveRaySampler,
        )

        cams = self._cams3()
        rs = AdaptiveRaySampler(
            image_width=8, image_height=8, n_pts_per_ray_training=4,
            n_rays_total_training=12, scene_extent=3.0,
        )
        mask = jnp.ones((3, 8, 8))
        ib = rs(cams, EvaluationMode.TRAINING, mask=mask, key=jax.random.PRNGKey(4))
        assert ib.origins.shape == (12, 1, 3)
        assert ib.camera_ids.shape == (12,)
        assert ib.camera_counts.shape == (3,)


class TestNdcGridSamplePacked:
    def test_matches_dense(self):
        from pytorch3d_tpu.renderer.utils import (
            ndc_grid_sample,
            ndc_grid_sample_packed,
        )

        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        imgs = jax.random.uniform(k1, (3, 4, 8, 6))  # (N, C, H, W)
        R = 50
        xys = jax.random.uniform(k2, (R, 2), minval=-0.9, maxval=0.9)
        ids = jax.random.randint(k3, (R,), 0, 3)
        packed = ndc_grid_sample_packed(imgs, xys, ids)  # (R, C)
        # dense reference: sample each ray from its own image
        dense = ndc_grid_sample(imgs[ids], xys[:, None])[:, :, 0]  # (R, C)
        assert np.allclose(np.asarray(packed), np.asarray(dense), atol=1e-5)

    def test_nearest_and_oob(self):
        from pytorch3d_tpu.renderer.utils import (
            ndc_grid_sample,
            ndc_grid_sample_packed,
        )

        imgs = jnp.arange(2 * 1 * 4 * 4, dtype=jnp.float32).reshape(2, 1, 4, 4)
        xys = jnp.asarray([[0.3, -0.4], [2.5, 0.0], [-0.1, 0.8]])  # one OOB
        ids = jnp.asarray([1, 0, 1])
        packed = ndc_grid_sample_packed(imgs, xys, ids, mode="nearest")
        dense = ndc_grid_sample(imgs[ids], xys[:, None], mode="nearest")[:, :, 0]
        assert np.allclose(np.asarray(packed), np.asarray(dense), atol=1e-6)


class TestSamplePdfGradients:
    """The one-hot pick path must carry the same gradients wrt bins and
    weights as a plain take_along_axis formulation (regression for the
    round-4 gather->one-hot rewrite)."""

    def test_matches_take_along_axis_grads(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pytorch3d_tpu.renderer.implicit.sample_pdf import sample_pdf

        def sample_pdf_gather(bins, weights, n_samples, key):
            eps = 1e-5
            w = weights + eps
            pdf = w / jnp.sum(w, axis=-1, keepdims=True)
            cdf = jnp.cumsum(pdf, axis=-1)
            cdf = jnp.concatenate(
                [jnp.zeros_like(cdf[..., :1]), cdf], axis=-1
            )
            u = jax.random.uniform(
                key, cdf.shape[:-1] + (n_samples,), cdf.dtype
            )
            inds = jnp.sum(
                (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32),
                axis=-2,
            )
            below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
            above = jnp.clip(inds, 0, cdf.shape[-1] - 1)
            cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
            cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
            bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
            bins_g1 = jnp.take_along_axis(bins, above, axis=-1)
            denom = cdf_g1 - cdf_g0
            denom = jnp.where(denom < eps, 1.0, denom)
            t = (u - cdf_g0) / denom
            return bins_g0 + t * (bins_g1 - bins_g0)

        key = jax.random.PRNGKey(3)
        R, S = 64, 32
        bins = jnp.sort(
            jax.random.uniform(key, (R, S + 1), minval=1.0, maxval=5.0),
            axis=-1,
        )
        weights = jax.random.uniform(jax.random.PRNGKey(4), (R, S))
        uk = jax.random.PRNGKey(5)

        def loss_ours(b, w):
            return jnp.sum(jnp.sin(sample_pdf(b, w, 24, key=uk)))

        def loss_ref(b, w):
            return jnp.sum(jnp.sin(sample_pdf_gather(b, w, 24, uk)))

        vo, go = jax.value_and_grad(loss_ours, argnums=(0, 1))(bins, weights)
        vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(bins, weights)
        np.testing.assert_allclose(float(vo), float(vr), rtol=1e-6)
        for a, b in zip(go, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
            )
