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
