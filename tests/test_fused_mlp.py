"""Fused MLP Pallas kernel vs the jnp oracle (values + all gradients).

CPU runs in Pallas interpret mode; on TPU the same code compiles via
Mosaic (exercised by benchmarks/exp_nerf.py and the bench-time session).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch3d_tpu.ops.fused_mlp_pallas as fm


@pytest.fixture(autouse=True)
def _interpret():
    old = fm._INTERPRET
    fm._INTERPRET = jax.default_backend() != "tpu"
    yield
    fm._INTERPRET = old


def _params(key, d_in, hidden, n_layers, skips):
    ws, bs = [], []
    for li in range(n_layers):
        in_dim = (
            hidden + d_in if li in skips else (d_in if li == 0 else hidden)
        )
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(
            jax.random.normal(k1, (in_dim, hidden), jnp.float32)
            * (2.0 / in_dim) ** 0.5
        )
        bs.append(jax.random.normal(k2, (hidden,), jnp.float32) * 0.01)
    return tuple(ws), tuple(bs)


class TestFusedMLP:
    @pytest.mark.parametrize(
        "n,d_in,hidden,n_layers,skips",
        [
            (700, 63, 256, 8, (5,)),   # the NeRF mlp256x8 shape
            (512, 39, 128, 6, (3,)),   # train-parity shape
            (130, 63, 256, 2, ()),     # no skip, ragged N
            (1024, 63, 128, 4, (1, 3)),  # two skips
        ],
    )
    def test_forward_matches_oracle(self, n, d_in, hidden, n_layers, skips):
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d_in), jnp.float32)
        ws, bs = _params(jax.random.PRNGKey(1), d_in, hidden, n_layers, skips)
        got = fm.fused_mlp(x, ws, bs, skips)
        want = fm.fused_mlp_reference(x, ws, bs, skips)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_gradients_match_oracle(self):
        n, d_in, hidden, n_layers, skips = 700, 63, 128, 4, (2,)
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d_in), jnp.float32)
        ws, bs = _params(jax.random.PRNGKey(1), d_in, hidden, n_layers, skips)
        # weight the output so the cotangent is not uniform
        cot = jax.random.normal(
            jax.random.PRNGKey(2), (n, hidden), jnp.float32
        )

        def loss_fused(x, ws, bs):
            return jnp.sum(fm.fused_mlp(x, ws, bs, skips) * cot)

        def loss_ref(x, ws, bs):
            return jnp.sum(fm.fused_mlp_reference(x, ws, bs, skips) * cot)

        v_f, g_f = jax.value_and_grad(loss_fused, (0, 1, 2))(x, ws, bs)
        v_r, g_r = jax.value_and_grad(loss_ref, (0, 1, 2))(x, ws, bs)
        np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_f),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-4
            )

    def test_bfloat16_close_to_fp32_oracle(self):
        n, d_in, hidden, n_layers, skips = 600, 63, 128, 4, (2,)
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d_in), jnp.float32)
        ws, bs = _params(jax.random.PRNGKey(1), d_in, hidden, n_layers, skips)
        got = fm.fused_mlp(
            x.astype(jnp.bfloat16),
            tuple(w.astype(jnp.bfloat16) for w in ws),
            tuple(b.astype(jnp.bfloat16) for b in bs),
            skips,
        ).astype(jnp.float32)
        want = fm.fused_mlp_reference(x, ws, bs, skips)
        # bf16 mantissa: expect ~1e-2 relative agreement
        denom = np.maximum(np.abs(np.asarray(want)), 1e-3)
        rel = np.abs(np.asarray(got) - np.asarray(want)) / denom
        assert float(np.median(rel)) < 2e-2

    def test_jit_and_grad_through_wrapper(self):
        n, d_in, hidden, n_layers, skips = 300, 63, 128, 3, (1,)
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d_in), jnp.float32)
        ws, bs = _params(jax.random.PRNGKey(1), d_in, hidden, n_layers, skips)

        @jax.jit
        def f(x):
            return jnp.sum(fm.fused_mlp(x, ws, bs, skips) ** 2)

        g = jax.grad(f)(x)
        assert np.isfinite(np.asarray(g)).all()


class TestFusedNeRFField:
    """fused_nerf_field (trunk + density/color heads in one kernel) vs
    the jnp oracle: values and every gradient, incl. the view-direction
    embedding input (camera-optimization path)."""

    def _setup(self, n=700, d_in=63, hidden=256, n_layers=8, skips=(5,),
               d_dir=27, hidden_dir=128):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, d_in), jnp.float32)
        de = jax.random.normal(jax.random.PRNGKey(9), (n, d_dir))
        ws, bs = _params(jax.random.PRNGKey(1), d_in, hidden, n_layers, skips)
        ks = jax.random.split(jax.random.PRNGKey(2), 8)
        s = 0.05
        head = (
            s * jax.random.normal(ks[0], (hidden, 1)),          # wd
            s * jax.random.normal(ks[1], (1,)),                 # bd
            s * jax.random.normal(ks[2], (hidden, hidden)),     # wi
            s * jax.random.normal(ks[3], (hidden,)),            # bi
            s * jax.random.normal(ks[4], (hidden, hidden_dir)),  # wc1a
            s * jax.random.normal(ks[5], (d_dir, hidden_dir)),  # wc1b
            s * jax.random.normal(ks[6], (hidden_dir,)),        # bc1
            s * jax.random.normal(ks[7], (hidden_dir, 3)),      # wc2
            jnp.zeros((3,)),                                    # bc2
        )
        return x, de, ws, bs, head, skips

    def test_forward_matches_oracle(self):
        x, de, ws, bs, head, skips = self._setup()
        got = fm.fused_nerf_field(x, de, ws, bs, head, skips)
        want = fm.fused_nerf_field_reference(x, de, ws, bs, head, skips)
        assert got.shape == (x.shape[0], 4)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )

    def test_all_gradients_match_oracle(self):
        x, de, ws, bs, head, skips = self._setup(
            n=300, hidden=128, n_layers=4, skips=(2,)
        )

        def loss(fn, x, de, ws, bs, head):
            out = fn(x, de, ws, bs, head, skips)
            return jnp.sum(out * jnp.array([1.0, 0.5, -0.3, 0.2]))

        g_got = jax.grad(
            lambda *a: loss(fm.fused_nerf_field, *a), argnums=(0, 1, 2, 3, 4)
        )(x, de, ws, bs, head)
        g_want = jax.grad(
            lambda *a: loss(fm.fused_nerf_field_reference, *a),
            argnums=(0, 1, 2, 3, 4),
        )(x, de, ws, bs, head)
        flat_got = jax.tree_util.tree_leaves(g_got)
        flat_want = jax.tree_util.tree_leaves(g_want)
        assert len(flat_got) == len(flat_want)
        for a, b in zip(flat_got, flat_want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
            )
