"""Parity + integration for the mip-NeRF conical-frustum helpers
(compute_radii, frustum Gaussians, blurpool) and the IDR
RayNormalColoringNetwork wiring — vs the reference's pure-torch
implementations (implicitron/models/renderer/{base,ray_sampler,
ray_point_refiner}.py)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_compat import (  # noqa: E402
    import_reference,
    import_reference_implicitron_module,
)

import_reference()
import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
    )


class TestFrustumGaussianParity:
    def _bins_radii(self, seed=0):
        rng = np.random.RandomState(seed)
        bins = np.sort(
            rng.uniform(0.5, 6.0, size=(2, 5, 9)).astype(np.float32), axis=-1
        )
        radii = rng.uniform(0.001, 0.02, size=(2, 5, 1)).astype(np.float32)
        return bins, radii

    def test_approximation(self):
        ref_base = import_reference_implicitron_module(
            "pytorch3d.implicitron.models.renderer.base"
        )
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            approximate_conical_frustum_as_gaussians,
        )

        bins, radii = self._bins_radii()
        ref = ref_base.approximate_conical_frustum_as_gaussians(
            torch.from_numpy(bins), torch.from_numpy(radii)
        )
        ours = approximate_conical_frustum_as_gaussians(
            jnp.asarray(bins), jnp.asarray(radii)
        )
        for o, r in zip(ours, ref):
            close(o, t2n(r), rtol=1e-4, atol=1e-6)

    def test_diagonal_covariance(self):
        ref_base = import_reference_implicitron_module(
            "pytorch3d.implicitron.models.renderer.base"
        )
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            compute_3d_diagonal_covariance_gaussian,
        )

        rng = np.random.RandomState(1)
        dirs = rng.randn(2, 5, 3).astype(np.float32)
        var_t = rng.rand(2, 5, 8).astype(np.float32)
        var_r = rng.rand(2, 5, 8).astype(np.float32)
        ref = ref_base.compute_3d_diagonal_covariance_gaussian(
            torch.from_numpy(dirs),
            torch.from_numpy(var_t),
            torch.from_numpy(var_r),
        )
        ours = compute_3d_diagonal_covariance_gaussian(
            jnp.asarray(dirs), jnp.asarray(var_t), jnp.asarray(var_r)
        )
        close(ours, t2n(ref), rtol=1e-4, atol=1e-6)

    def test_conical_frustum_to_gaussian(self):
        ref_base = import_reference_implicitron_module(
            "pytorch3d.implicitron.models.renderer.base"
        )
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            ImplicitronRayBundle,
            conical_frustum_to_gaussian,
        )

        bins, radii = self._bins_radii(3)
        rng = np.random.RandomState(4)
        origins = rng.randn(2, 5, 3).astype(np.float32)
        dirs = rng.randn(2, 5, 3).astype(np.float32)
        lengths = 0.5 * (bins[..., 1:] + bins[..., :-1])
        xys = rng.randn(2, 5, 2).astype(np.float32)

        ref_rb = ref_base.ImplicitronRayBundle(
            origins=torch.from_numpy(origins),
            directions=torch.from_numpy(dirs),
            lengths=None,
            xys=torch.from_numpy(xys),
            bins=torch.from_numpy(bins),
            pixel_radii_2d=torch.from_numpy(radii),
        )
        ref_means, ref_cov = ref_base.conical_frustum_to_gaussian(ref_rb)

        rb = ImplicitronRayBundle(
            origins=jnp.asarray(origins),
            directions=jnp.asarray(dirs),
            lengths=jnp.asarray(lengths),
            xys=jnp.asarray(xys),
            bins=jnp.asarray(bins),
            pixel_radii_2d=jnp.asarray(radii),
        )
        means, cov = conical_frustum_to_gaussian(rb)
        close(means, t2n(ref_means), rtol=1e-4, atol=1e-5)
        close(cov, t2n(ref_cov), rtol=1e-4, atol=1e-6)

    def test_raises_without_cone(self):
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            ImplicitronRayBundle,
            conical_frustum_to_gaussian,
        )

        rb = ImplicitronRayBundle(
            origins=jnp.zeros((1, 2, 3)),
            directions=jnp.ones((1, 2, 3)),
            lengths=jnp.ones((1, 2, 4)),
            xys=jnp.zeros((1, 2, 2)),
        )
        with pytest.raises(ValueError):
            conical_frustum_to_gaussian(rb)


class TestBlurpoolParity:
    def test_matches_reference(self):
        ref_rpr = import_reference_implicitron_module(
            "pytorch3d.implicitron.models.renderer.ray_point_refiner"
        )
        from pytorch3d_tpu.implicitron.models.renderer.ray_point_refiner import (
            apply_blurpool_on_weights,
        )

        w = np.random.RandomState(5).rand(3, 4, 16).astype(np.float32)
        ref = ref_rpr.apply_blurpool_on_weights(torch.from_numpy(w))
        ours = apply_blurpool_on_weights(jnp.asarray(w))
        close(ours, t2n(ref), rtol=1e-5, atol=1e-6)


class TestComputeRadiiParity:
    def test_matches_reference(self):
        ref_rs = import_reference_implicitron_module(
            "pytorch3d.implicitron.models.renderer.ray_sampler"
        )
        from pytorch3d.renderer import PerspectiveCameras as RefCameras

        from pytorch3d_tpu.implicitron.models.renderer.ray_sampler import (
            compute_radii,
        )
        from pytorch3d_tpu.renderer import PerspectiveCameras

        rng = np.random.RandomState(6)
        xy = rng.uniform(-1, 1, size=(2, 7, 2)).astype(np.float32)
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3)).copy()
        T = np.zeros((2, 3), np.float32)
        ref = ref_rs.compute_radii(
            RefCameras(
                focal_length=1.2, R=torch.from_numpy(R), T=torch.from_numpy(T)
            ),
            torch.from_numpy(xy),
            (0.02, 0.03),
        )
        ours = compute_radii(
            PerspectiveCameras.create(
                focal_length=1.2, R=jnp.asarray(R), T=jnp.asarray(T)
            ),
            jnp.asarray(xy),
            (0.02, 0.03),
        )
        close(ours, t2n(ref), rtol=1e-4, atol=1e-6)


class TestConeCastIntegration:
    def test_sampler_produces_bins_and_radii(self):
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            EvaluationMode,
            conical_frustum_to_gaussian,
        )
        from pytorch3d_tpu.implicitron.models.renderer.ray_sampler import (
            AdaptiveRaySampler,
        )
        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )

        R, T = look_at_view_transform(2.7, 10.0, 20.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        sampler = AdaptiveRaySampler(
            image_width=8,
            image_height=8,
            n_pts_per_ray_training=6,
            n_pts_per_ray_evaluation=6,
            n_rays_per_image_sampled_from_mask=16,
            scene_extent=3.0,
            cast_ray_bundle_as_cone=True,
        )
        rb = sampler(
            cams, EvaluationMode.TRAINING,
            mask=jnp.ones((1, 8, 8)),
            key=jax.random.PRNGKey(0),
        )
        assert rb.bins is not None and rb.bins.shape[-1] == 7
        assert rb.lengths.shape[-1] == 6
        np.testing.assert_allclose(
            np.asarray(rb.lengths),
            0.5 * (np.asarray(rb.bins)[..., 1:] + np.asarray(rb.bins)[..., :-1]),
            rtol=1e-6,
        )
        assert rb.pixel_radii_2d is not None
        assert np.isfinite(np.asarray(rb.pixel_radii_2d)).all()
        assert (np.asarray(rb.pixel_radii_2d) > 0).all()
        means, cov = conical_frustum_to_gaussian(rb)
        assert means.shape[-2:] == (6, 3) and cov.shape[-2:] == (6, 3)
        assert np.isfinite(np.asarray(means)).all()


class TestSDFRgbNetwork:
    def test_generic_model_with_rgb_network_trains(self):
        from pytorch3d_tpu.implicitron.models.generic_model import (
            GenericModel,
        )
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            EvaluationMode,
        )
        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )

        model = GenericModel(
            render_image_width=8,
            render_image_height=8,
            num_passes=1,
            chunk_size_grid=0,
            raysampler_args=dict(
                n_pts_per_ray_training=4,
                n_pts_per_ray_evaluation=4,
                n_rays_per_image_sampled_from_mask=8,
                scene_extent=3.0,
            ),
            renderer_class_type="SignedDistanceFunctionRenderer",
            renderer_args=dict(
                ray_tracer_args=dict(n_steps=8, sphere_tracing_iters=2),
                ray_normal_coloring_network_args=dict(
                    dims=(16, 16), n_harmonic_functions_dir=1
                ),
            ),
            implicit_function_class_type="IdrFeatureField",
            implicit_function_args=dict(
                dims=(16, 16), skip_in=(), n_harmonic_functions_xyz=2
            ),
        )
        R, T = look_at_view_transform(2.7, 10.0, 20.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        img = jnp.ones((1, 8, 8, 3)) * 0.5
        fg = jnp.ones((1, 8, 8, 1))
        params = model.init(
            jax.random.PRNGKey(0),
            image_rgb=img,
            camera=cams,
            fg_probability=fg,
            evaluation_mode=EvaluationMode.TRAINING,
        )
        # the rgb network's params must exist in the model scope
        flat = jax.tree_util.tree_leaves(params)
        names = str(jax.tree_util.tree_structure(params))
        assert "_renderer_flax_module" in names

        def loss(p):
            preds = model.apply(
                p,
                image_rgb=img,
                camera=cams,
                fg_probability=fg,
                evaluation_mode=EvaluationMode.TRAINING,
            )
            return preds["objective"]

        l, g = jax.value_and_grad(lambda p: loss(p))(params)
        assert np.isfinite(float(l))
        gnorm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
        )
        assert np.isfinite(gnorm)


class TestSDFTrainingSemantics:
    """The reference training path of SignedDistanceFunctionRenderer
    (sdf_renderer.py:131-237): differentiable sample-network surface
    points, sigmoid(-alpha*sdf) miss-mask, eikonal aux."""

    def _field_and_rays(self):
        import jax
        import jax.numpy as jnp

        from pytorch3d_tpu.implicitron.models.implicit_function.idr_feature_field import (
            IdrFeatureField,
        )

        field = IdrFeatureField(
            dims=(32, 32), skip_in=(), n_harmonic_functions_xyz=2
        )
        pts0 = jnp.zeros((1, 3))
        params = field.init(jax.random.PRNGKey(0), pts0)
        return field, params

    def test_geometric_init_traces_a_sphere(self):
        """sdf ~ |x| - bias at init: negative inside, positive outside,
        monotone along a radius (the flat-SDF failure mode regression)."""
        import jax.numpy as jnp

        field, params = self._field_and_rays()
        radii = jnp.array([0.0, 0.5, 1.5, 2.0])
        pts = jnp.stack([radii, jnp.zeros_like(radii), jnp.zeros_like(radii)], -1)
        sdf = field.apply(params, pts)[..., 0]
        assert float(sdf[0]) < 0.0, "origin must start inside"
        assert float(sdf[-1]) > 0.0, "far field must start outside"
        assert bool(jnp.all(jnp.diff(sdf) > 0)), "sdf must grow radially"

    def test_training_mode_mask_gradient_and_eikonal_aux(self):
        """Missed rays must carry mask gradient (soft sigmoid branch) and
        TRAINING mode must emit the eikonal sample gradients."""
        import jax
        import jax.numpy as jnp

        from pytorch3d_tpu.implicitron.models.renderer.base import (
            EvaluationMode,
            ImplicitronRayBundle,
        )
        from pytorch3d_tpu.implicitron.models.renderer.sdf_renderer import (
            SignedDistanceFunctionRenderer,
        )

        field, params = self._field_and_rays()
        renderer = SignedDistanceFunctionRenderer(
            ray_tracer_args=dict(n_steps=8, sphere_tracing_iters=2),
            bg_color=(1.0, 1.0, 1.0),
        )
        # rays that NARROWLY miss the init surface (zero crossing near
        # r ~ bias): sdf at closest approach stays small so the sigmoid
        # miss-mask is strictly inside (0, 1) instead of underflowing
        R = 6
        origins = jnp.tile(jnp.array([[3.0, 1.3, 0.0]]), (R, 1))[None]
        dirs = jnp.tile(jnp.array([[-1.0, 0.0, 0.0]]), (R, 1))[None]
        bundle = ImplicitronRayBundle(
            origins=origins,
            directions=dirs,
            lengths=jnp.linspace(0.5, 6.0, 8)[None, None].repeat(R, 1),
            xys=jnp.zeros((1, R, 2)),
        )

        def run(p, mode):
            return renderer(
                bundle,
                implicit_functions=[
                    lambda x, _p=p: field.apply(_p, x)
                ],
                evaluation_mode=mode,
                object_mask=jnp.zeros((1, R)),  # GT says background
                key=jax.random.PRNGKey(3),
            )

        out = run(params, EvaluationMode.TRAINING)
        assert "grad_theta" in out.aux, "eikonal sample grads missing"
        assert out.aux["grad_theta"].shape[-1] == 3
        # miss-mask must be strictly inside (0, 1) — the sigmoid branch
        m = out.masks
        assert float(m.max()) < 1.0 and float(m.min()) > 0.0

        def mask_sum(p):
            return jnp.sum(run(p, EvaluationMode.TRAINING).masks)

        g = jax.grad(
            lambda p: mask_sum(p)
        )(params)
        gnorm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
        )
        assert gnorm > 0.0, "mask must be differentiable on misses"

    def test_eval_mode_has_no_eikonal_aux(self):
        import jax
        import jax.numpy as jnp

        from pytorch3d_tpu.implicitron.models.renderer.base import (
            EvaluationMode,
            ImplicitronRayBundle,
        )
        from pytorch3d_tpu.implicitron.models.renderer.sdf_renderer import (
            SignedDistanceFunctionRenderer,
        )

        field, params = self._field_and_rays()
        renderer = SignedDistanceFunctionRenderer(
            ray_tracer_args=dict(n_steps=8, sphere_tracing_iters=2)
        )
        R = 4
        bundle = ImplicitronRayBundle(
            origins=jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (R, 1))[None],
            directions=jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))[None],
            lengths=jnp.linspace(0.5, 6.0, 8)[None, None].repeat(R, 1),
            xys=jnp.zeros((1, R, 2)),
        )
        out = renderer(
            bundle,
            implicit_functions=[lambda x: field.apply(params, x)],
            evaluation_mode=EvaluationMode.EVALUATION,
            key=jax.random.PRNGKey(0),
        )
        assert "grad_theta" not in out.aux
