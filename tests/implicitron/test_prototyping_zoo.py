"""Tests for the pytorch_prototyping conv/U-Net zoo.

Shape/behavior contracts mirror the reference
implicitron/third_party/pytorch_prototyping.py (NHWC here vs torch NCHW).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch3d_tpu.implicitron.third_party.pytorch_prototyping import (
    Conv2dSame,
    Conv3dSame,
    DownBlock,
    DownBlock3D,
    DownsamplingNet,
    FCBlock,
    Identity,
    LayerNormConv2d,
    Unet,
    Unet3d,
    UpBlock,
    UpBlock3D,
    UpsamplingNet,
)


def _init_apply(mod, x, **kw):
    vs = mod.init(jax.random.PRNGKey(0), x, **kw)
    return mod.apply(vs, x, **kw)


class TestConvBlocks:
    def test_conv2d_same_keeps_dims(self):
        x = jnp.ones((2, 13, 17, 3))
        for k in (3, 4, 5):
            y = _init_apply(Conv2dSame(8, k), x)
            assert y.shape == (2, 13, 17, 8)

    def test_conv3d_same_keeps_dims(self):
        x = jnp.ones((1, 6, 7, 8, 2))
        y = _init_apply(Conv3dSame(4, 3), x)
        assert y.shape == (1, 6, 7, 8, 4)

    def test_down_up_block_2d(self):
        x = jnp.ones((2, 16, 16, 3))
        d = _init_apply(DownBlock(8), x)
        assert d.shape == (2, 8, 8, 8)
        u = _init_apply(UpBlock(4), d)
        assert u.shape == (2, 16, 16, 4)

    @pytest.mark.parametrize(
        "mode", ["transpose", "bilinear", "nearest", "shuffle"]
    )
    def test_upblock_modes(self, mode):
        x = jnp.ones((1, 8, 8, 4))
        y = _init_apply(UpBlock(6, upsampling_mode=mode), x)
        assert y.shape == (1, 16, 16, 6)

    def test_upblock_skip_concat(self):
        x = jnp.ones((1, 8, 8, 4))
        skip = jnp.ones((1, 8, 8, 4))
        mod = UpBlock(6)
        vs = mod.init(jax.random.PRNGKey(0), x, skipped=skip)
        y = mod.apply(vs, x, skipped=skip)
        assert y.shape == (1, 16, 16, 6)

    def test_down_up_block_3d(self):
        x = jnp.ones((1, 8, 8, 8, 3))
        d = _init_apply(DownBlock3D(6), x)
        assert d.shape == (1, 4, 4, 4, 6)
        u = _init_apply(UpBlock3D(3), d)
        assert u.shape == (1, 8, 8, 8, 3)


class TestUnets:
    def test_unet_shape(self):
        x = jnp.ones((1, 32, 32, 3))
        y = _init_apply(
            Unet(out_channels=5, nf0=4, num_down=3, max_channels=16,
                 outermost_linear=True),
            x,
        )
        assert y.shape == (1, 32, 32, 5)

    def test_unet_channel_cap(self):
        # max_channels caps growth: num_down=4 with nf0=4 would want 32
        x = jnp.ones((1, 32, 32, 2))
        y = _init_apply(
            Unet(out_channels=2, nf0=4, num_down=4, max_channels=8), x
        )
        assert y.shape == (1, 32, 32, 2)

    def test_unet3d_shape(self):
        x = jnp.ones((1, 8, 8, 8, 2))
        y = _init_apply(
            Unet3d(out_channels=3, nf0=2, num_down=2, max_channels=8), x
        )
        assert y.shape == (1, 8, 8, 8, 3)

    def test_unet_grad_flows(self):
        mod = Unet(out_channels=1, nf0=2, num_down=2, max_channels=4,
                   norm=None, outermost_linear=True)
        x = jnp.ones((1, 16, 16, 1))
        vs = mod.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.sum(mod.apply(p, x) ** 2)

        g = jax.grad(loss)(vs)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


class TestNets:
    def test_downsampling_net(self):
        x = jnp.ones((1, 32, 32, 3))
        y = _init_apply(
            DownsamplingNet([4, 8, 16], use_dropout=False,
                            last_layer_one=False),
            x,
        )
        assert y.shape == (1, 4, 4, 16)

    def test_upsampling_net(self):
        x = jnp.ones((1, 4, 4, 16))
        y = _init_apply(
            UpsamplingNet([8, 4], use_dropout=False), x
        )
        assert y.shape == (1, 16, 16, 4)

    def test_empty_nets_identity(self):
        x = jnp.ones((1, 8, 8, 3))
        assert _init_apply(DownsamplingNet([]), x).shape == x.shape
        assert _init_apply(UpsamplingNet([]), x).shape == x.shape
        assert _init_apply(Identity(), x).shape == x.shape

    def test_fcblock(self):
        x = jnp.ones((7, 3))
        y = _init_apply(
            FCBlock(hidden_ch=8, num_hidden_layers=2, out_features=5,
                    outermost_linear=True),
            x,
        )
        assert y.shape == (7, 5)


class TestLayerNormConv2dParity:
    def test_matches_reference_torch(self):
        torch = pytest.importorskip("torch")
        import sys
        import types

        # the reference file imports torchvision.utils, unused by LNC
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv.utils = types.ModuleType("torchvision.utils")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.utils"] = tv.utils
        sys.path.insert(0, "/root/reference")
        try:
            from pytorch3d.implicitron.third_party.pytorch_prototyping import (
                LayerNormConv2d as RefLNC,
            )
        finally:
            sys.path.pop(0)

        rng = np.random.RandomState(0)
        x = rng.randn(2, 5, 6, 7).astype(np.float32)  # torch NCHW
        ref = RefLNC(5)
        with torch.no_grad():
            ref.gamma.copy_(torch.tensor(rng.rand(5).astype(np.float32)))
            ref.beta.copy_(torch.tensor(rng.rand(5).astype(np.float32)))
            want = ref(torch.tensor(x)).numpy()

        mod = LayerNormConv2d(5)
        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        vs = mod.init(jax.random.PRNGKey(0), x_nhwc)
        vs = jax.tree_util.tree_map(lambda a: a, vs)
        vs = {
            "params": {
                "gamma": jnp.asarray(ref.gamma.detach().numpy()),
                "beta": jnp.asarray(ref.beta.detach().numpy()),
            }
        }
        got = np.moveaxis(np.asarray(mod.apply(vs, x_nhwc)), -1, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
