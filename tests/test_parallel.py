"""Multi-device sharding tests on the virtual 8-CPU mesh
(conftest.py sets xla_force_host_platform_device_count=8).

The reference has no cluster-simulation story (SURVEY.md 4.5) — this is an
improvement slot: sharded steps are checked for numerical equality with the
single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch3d_tpu.models import RadianceFieldRenderer
from pytorch3d_tpu.parallel import (
    get_device_mesh,
    make_nerf_train_step,
    shard_rays,
)
from pytorch3d_tpu.renderer import FoVPerspectiveCameras, look_at_view_transform


def _setup(dp=2):
    model = RadianceFieldRenderer(
        image_width=16, image_height=16,
        n_pts_per_ray=8, n_pts_per_ray_fine=8, n_rays_per_image=64,
        min_depth=0.5, max_depth=4.0,
        n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
        n_layers_xyz=2, append_xyz=(1,),
    )
    R, T = look_at_view_transform(dist=2.7, azim=jnp.linspace(0.0, 90.0, dp))
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    image = jnp.broadcast_to(
        jnp.asarray([0.2, 0.5, 0.8]), (dp, 16, 16, 3)
    )
    key = jax.random.PRNGKey(0)
    params = model.init(jax.random.PRNGKey(1), cams, image=image, key=key)
    return model, cams, image, params


class TestDeviceMesh:
    def test_mesh_shapes(self):
        assert len(jax.devices()) == 8
        mesh = get_device_mesh()
        assert mesh.shape == {"dp": 1, "rays": 8}
        mesh2 = get_device_mesh(shape=(2, 4))
        assert mesh2.shape == {"dp": 2, "rays": 4}

    def test_bad_shape(self):
        with pytest.raises(ValueError):
            get_device_mesh(shape=(3, 5))


class TestShardedTrainStep:
    def test_sharded_matches_single_device(self):
        model, cams, image, params = _setup(dp=2)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        key = jax.random.PRNGKey(7)

        step_single = make_nerf_train_step(model, optimizer, mesh=None)
        p1, _, m1 = step_single(params, opt_state, cams, image, key)

        mesh = get_device_mesh(shape=(2, 4))
        step_sharded = make_nerf_train_step(model, optimizer, mesh=mesh)
        p2, _, m2 = step_sharded(params, opt_state, cams, image, key)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_sharded_multi_step_improves(self):
        model, cams, image, params = _setup(dp=2)
        optimizer = optax.adam(5e-3)
        opt_state = optimizer.init(params)
        mesh = get_device_mesh(shape=(2, 4))
        step = make_nerf_train_step(model, optimizer, mesh=mesh)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(10):
            key, sub = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, cams, image, sub)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_ray_sharding_spec(self):
        mesh = get_device_mesh(shape=(2, 4))
        s = shard_rays(mesh)
        x = jax.device_put(jnp.zeros((2, 64, 3)), s)
        assert len(x.addressable_shards) == 8


class TestShardMapRaster:
    """Pixel-row-sharded rasterization (parallel/raster.py): shard_map
    over the rays axis must reproduce the unsharded rasterizer exactly
    and psum the face-vertex gradient across bands."""

    def _faces(self):
        from pytorch3d_tpu.renderer import (
            MeshRasterizer,
            RasterizationSettings,
        )
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(2)
        R, T = look_at_view_transform(dist=2.7, elev=15.0, azim=40.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        rast = MeshRasterizer(
            cams, RasterizationSettings(image_size=64)
        )
        tm = rast.transform(mesh)
        fv = tm.verts_padded()[0][tm.faces_padded()[0]]
        valid = tm.faces_padded()[0, :, 0] >= 0
        return fv, valid

    def test_sharded_equals_unsharded(self):
        from pytorch3d_tpu.parallel.raster import (
            rasterize_fragments_shard_map,
        )
        from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
            interpolate_fragments,
            rasterize_topk_xla,
        )

        fv, valid = self._faces()
        mesh = get_device_mesh((1, 8))
        idx_s, z_s, b_s, d_s = rasterize_fragments_shard_map(
            fv, valid, (64, 64), mesh, axis="rays",
            blur_radius=1e-4, faces_per_pixel=4,
        )
        idx_u = rasterize_topk_xla(
            fv, valid, (64, 64), blur_radius=1e-4, faces_per_pixel=4
        )
        z_u, b_u, d_u = interpolate_fragments(fv, idx_u, (64, 64))
        np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_u))
        np.testing.assert_allclose(
            np.asarray(z_s), np.asarray(z_u), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(d_s), np.asarray(d_u), atol=1e-6
        )

    def test_sharded_gradient_psum(self):
        from pytorch3d_tpu.parallel.raster import (
            sharded_silhouette_loss_and_grad,
        )

        fv, valid = self._faces()
        mesh8 = get_device_mesh((1, 8))
        mesh1 = get_device_mesh((1, 1), devices=jax.devices()[:1])
        l8, g8 = sharded_silhouette_loss_and_grad(
            fv, valid, (64, 64), mesh8
        )
        l1, g1 = sharded_silhouette_loss_and_grad(
            fv, valid, (64, 64), mesh1
        )
        np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g8), np.asarray(g1), atol=1e-6
        )
        assert float(jnp.abs(g8).max()) > 0


class TestShardMapRasterPallas:
    """VERDICT r2 #3: the sharded path must drive the PRODUCTION Pallas
    kernel, not the XLA oracle.  Interpret-mode on the virtual CPU mesh:
    sharded (backend="pallas") must bit-equal the unsharded Pallas op,
    and the psum'd face gradient must match the single-band gradient."""

    @pytest.fixture(autouse=True)
    def _interpret_pallas(self, monkeypatch):
        from jax.experimental import pallas as pl

        import pytorch3d_tpu.renderer.mesh.rasterize_pallas as rmp

        orig = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        monkeypatch.setattr(rmp.pl, "pallas_call", patched)
        yield

    def _faces(self, image_size=128):
        from pytorch3d_tpu.renderer import (
            MeshRasterizer,
            RasterizationSettings,
        )
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(2)
        R, T = look_at_view_transform(dist=2.7, elev=15.0, azim=40.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        rast = MeshRasterizer(
            cams, RasterizationSettings(image_size=image_size)
        )
        tm = rast.transform(mesh)
        fv = tm.verts_padded()[0][tm.faces_padded()[0]]
        valid = tm.faces_padded()[0, :, 0] >= 0
        return fv, valid

    def test_sharded_pallas_bit_equals_unsharded(self):
        from pytorch3d_tpu.parallel.raster import (
            rasterize_fragments_shard_map,
        )
        from pytorch3d_tpu.renderer.mesh.rasterize_pallas import (
            rasterize_fragments_pallas,
        )

        fv, valid = self._faces()
        mesh = get_device_mesh((1, 4), devices=jax.devices()[:4])
        out_s = rasterize_fragments_shard_map(
            fv, valid, (128, 128), mesh, axis="rays",
            blur_radius=1e-4, faces_per_pixel=4, backend="pallas",
        )
        out_u = rasterize_fragments_pallas(
            fv, valid, (128, 128), blur_radius=1e-4, faces_per_pixel=4,
        )
        for a, b, name in zip(
            out_s, out_u, ("pix_to_face", "zbuf", "bary", "dists")
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=name
            )

    def test_sharded_pallas_gradient_psum(self):
        from pytorch3d_tpu.parallel.raster import (
            rasterize_fragments_shard_map,
        )
        from pytorch3d_tpu.renderer.mesh.rasterize_pallas import (
            rasterize_fragments_pallas,
        )

        fv, valid = self._faces()
        mesh = get_device_mesh((1, 4), devices=jax.devices()[:4])

        def loss_sharded(f):
            _, z, b, d = rasterize_fragments_shard_map(
                f, valid, (128, 128), mesh, axis="rays",
                blur_radius=1e-4, faces_per_pixel=4, backend="pallas",
            )
            alpha = 1.0 - jnp.prod(1.0 - jax.nn.sigmoid(-d / 1e-4), -1)
            return jnp.mean(alpha) + 1e-3 * jnp.mean(
                jnp.where(z > 0, z, 0.0)
            ) + 1e-3 * jnp.mean(b * b)

        def loss_unsharded(f):
            _, z, b, d = rasterize_fragments_pallas(
                f, valid, (128, 128), blur_radius=1e-4, faces_per_pixel=4,
            )
            alpha = 1.0 - jnp.prod(1.0 - jax.nn.sigmoid(-d / 1e-4), -1)
            return jnp.mean(alpha) + 1e-3 * jnp.mean(
                jnp.where(z > 0, z, 0.0)
            ) + 1e-3 * jnp.mean(b * b)

        ls, gs = jax.jit(jax.value_and_grad(loss_sharded))(fv)
        lu, gu = jax.value_and_grad(loss_unsharded)(fv)
        np.testing.assert_allclose(float(ls), float(lu), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gu), rtol=1e-5, atol=1e-7
        )
        assert float(jnp.abs(gs).max()) > 0


class TestShardMapGenericModel:
    def test_sharded_step_runs_and_improves(self):
        """shard_map GenericModel train step: disjoint per-device ray
        batches, pmean loss/grads (parallel/implicitron.py)."""
        import optax

        from pytorch3d_tpu.implicitron.models.generic_model import (
            GenericModel,
        )
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            EvaluationMode,
        )
        from pytorch3d_tpu.parallel import make_sharded_generic_train_step

        model = GenericModel(
            render_image_width=16, render_image_height=16, num_passes=1,
            chunk_size_grid=0,
            raysampler_args=dict(
                n_pts_per_ray_training=4, n_pts_per_ray_evaluation=4,
                n_rays_per_image_sampled_from_mask=16, scene_extent=3.0,
            ),
            implicit_function_args=dict(
                n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
                n_layers_xyz=2, append_xyz=(1,),
            ),
        )
        R, T = look_at_view_transform(dist=2.7, elev=10.0, azim=30.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        img = jnp.broadcast_to(jnp.asarray([0.3, 0.6, 0.2]), (1, 16, 16, 3))
        fg = jnp.ones((1, 16, 16, 1))
        batch = dict(image_rgb=img, camera=cams, fg_probability=fg)
        params = model.init(
            jax.random.PRNGKey(0), key=jax.random.PRNGKey(2),
            evaluation_mode=EvaluationMode.TRAINING, **batch
        )
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        mesh = get_device_mesh((1, 8))
        step = make_sharded_generic_train_step(
            model, opt, mesh,
            static_model_kwargs=dict(
                evaluation_mode=EvaluationMode.TRAINING
            ),
        )
        losses = []
        for i in range(4):
            params, opt_state, loss = step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestDistributedHelpers:
    def test_local_shard_indices(self):
        from pytorch3d_tpu.parallel import local_shard_indices

        parts = [
            local_shard_indices(10, process_index=i, process_count=3)
            for i in range(3)
        ]
        flat = [i for p in parts for i in p]
        assert flat == list(range(10))  # exact disjoint cover
        assert len(parts[2]) == 4  # tail to the last process

    def test_per_process_loader(self):
        from pytorch3d_tpu.parallel import PerProcessLoader

        ds = list(range(13))
        loader = PerProcessLoader(ds, global_batch_size=4)
        batches = list(loader)
        assert len(batches) == 3
        # single-process run: local shard == the whole global batch
        assert batches[0] == [0, 1, 2, 3]

    def test_maybe_initialize_noop(self):
        from pytorch3d_tpu.parallel import maybe_initialize_distributed

        assert maybe_initialize_distributed() is False


class TestMixedPrecisionStep:
    """make_nerf_train_step(compute_dtype=bf16): fp32 masters, bf16
    forward/backward, fp32 loss; converges like the fp32 step."""

    def test_bf16_step_trains(self):
        import optax

        from pytorch3d_tpu.models import RadianceFieldRenderer
        from pytorch3d_tpu.parallel import make_nerf_train_step
        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )

        model = RadianceFieldRenderer(
            image_width=16, image_height=16, n_pts_per_ray=4,
            n_pts_per_ray_fine=4, n_rays_per_image=16,
            min_depth=0.5, max_depth=4.0, n_hidden_neurons_xyz=16,
            n_hidden_neurons_dir=8, n_layers_xyz=2, append_xyz=(1,),
        )
        R, T = look_at_view_transform(2.7, 20.0, 30.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T, znear=0.5, zfar=10.0)
        image = jnp.ones((1, 16, 16, 3)) * 0.5
        key = jax.random.PRNGKey(0)
        params = model.init(jax.random.PRNGKey(1), cams, image=image, key=key)
        opt = optax.adam(1e-2)
        st = opt.init(params)
        step = make_nerf_train_step(model, opt, compute_dtype=jnp.bfloat16)
        losses = []
        for i in range(12):
            key, sub = jax.random.split(key)
            params, st, metrics = step(params, st, cams, image, sub)
            losses.append(float(metrics["loss"]))
        # masters stay fp32
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert leaf.dtype == jnp.float32
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestRematOption:
    def test_remat_identical_loss_and_grads(self):
        from pytorch3d_tpu.models import RadianceFieldRenderer
        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )

        R, T = look_at_view_transform(2.7, 20.0, 30.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T, znear=0.5, zfar=10.0)
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        key = jax.random.PRNGKey(0)
        results = {}
        for remat in (False, True):
            m = RadianceFieldRenderer(
                image_width=16, image_height=16, n_pts_per_ray=4,
                n_pts_per_ray_fine=4, n_rays_per_image=16, min_depth=0.5,
                max_depth=4.0, n_hidden_neurons_xyz=16,
                n_hidden_neurons_dir=8, n_layers_xyz=2, append_xyz=(1,),
                remat=remat,
            )
            p = m.init(jax.random.PRNGKey(1), cams, image=img, key=key)

            def loss(p, m=m):
                _, metr = m.apply(
                    p, cams, image=img, training=True,
                    key=jax.random.PRNGKey(2),
                )
                return metr["mse_fine"] + metr["mse_coarse"]

            l, g = jax.value_and_grad(loss)(p)
            gsum = sum(
                float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
            )
            results[remat] = (float(l), gsum)
        np.testing.assert_allclose(
            results[False][0], results[True][0], rtol=1e-5
        )
        np.testing.assert_allclose(
            results[False][1], results[True][1], rtol=1e-4
        )
