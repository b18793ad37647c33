"""Implicitron tools parity batch: calc_bce/log_lerp, make_depth_image,
get_rotation_to_best_fit_xy, cleanup_eval_depth — vs the reference's
pure-torch implementations — plus functional tests for the model_io
path helpers, Timer, and StatsJSONEncoder."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

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


class TestBCEParity:
    @pytest.mark.parametrize("equal_w", [True, False])
    @pytest.mark.parametrize("lerp_bound", [None, 0.1])
    @pytest.mark.parametrize("pred_logits", [False, True])
    def test_calc_bce(self, equal_w, lerp_bound, pred_logits):
        from pytorch3d.implicitron.tools.metric_utils import (
            calc_bce as ref_calc_bce,
        )

        from pytorch3d_tpu.implicitron.tools.metric_utils import calc_bce

        rng = np.random.RandomState(0)
        if pred_logits:
            pred = rng.randn(2, 1, 8, 8).astype(np.float32)
        else:
            pred = rng.rand(2, 1, 8, 8).astype(np.float32)
        gt = (rng.rand(2, 1, 8, 8) > 0.6).astype(np.float32)
        mask = (rng.rand(2, 1, 8, 8) > 0.2).astype(np.float32)
        kwargs = dict(
            equal_w=equal_w,
            mask=None if equal_w else None,
            lerp_bound=lerp_bound,
            pred_logits=pred_logits,
            pred_eps=0.0 if pred_logits else 0.01,
        )
        ref = ref_calc_bce(
            torch.from_numpy(pred), torch.from_numpy(gt), **kwargs
        )
        ours = calc_bce(jnp.asarray(pred), jnp.asarray(gt), **kwargs)
        close(ours, t2n(ref), rtol=1e-4, atol=1e-5)

    def test_log_lerp(self):
        from pytorch3d.implicitron.tools.metric_utils import (
            log_lerp as ref_log_lerp,
        )

        from pytorch3d_tpu.implicitron.tools.metric_utils import log_lerp

        x = np.linspace(-0.5, 2.0, 40).astype(np.float32)
        close(
            log_lerp(jnp.asarray(x), 0.2),
            t2n(ref_log_lerp(torch.from_numpy(x), 0.2)),
            rtol=1e-5,
            atol=1e-6,
        )


class TestMakeDepthImageParity:
    def test_matches_reference(self):
        from pytorch3d.implicitron.tools.vis_utils import (
            make_depth_image as ref_make_depth_image,
        )

        from pytorch3d_tpu.implicitron.tools.vis_utils import (
            make_depth_image,
        )

        rng = np.random.RandomState(3)
        depths = (rng.rand(2, 1, 12, 12) * 4 + 0.5).astype(np.float32)
        masks = (rng.rand(2, 1, 12, 12) > 0.3).astype(np.float32)
        ref = ref_make_depth_image(
            torch.from_numpy(depths), torch.from_numpy(masks)
        )
        ours = make_depth_image(jnp.asarray(depths), jnp.asarray(masks))
        close(ours, t2n(ref), rtol=1e-4, atol=1e-4)


class TestRotationToBestFitXY:
    def test_matches_reference(self):
        from pytorch3d.implicitron.tools.circle_fitting import (
            get_rotation_to_best_fit_xy as ref_fn,
        )

        from pytorch3d_tpu.implicitron.tools.circle_fitting import (
            get_rotation_to_best_fit_xy,
        )

        rng = np.random.RandomState(5)
        # points approximately in a tilted plane
        uv = rng.randn(40, 2).astype(np.float32)
        basis = np.linalg.qr(rng.randn(3, 3))[0][:, :2].astype(np.float32)
        pts = uv @ basis.T + 0.01 * rng.randn(40, 3).astype(np.float32)
        R_ref = t2n(ref_fn(torch.from_numpy(pts)))
        R_ours = np.asarray(get_rotation_to_best_fit_xy(jnp.asarray(pts)))
        # eigenvector sign is arbitrary; compare projected z-spread and
        # rotation validity instead of raw entries
        for R in (R_ref, R_ours):
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0
        z_ref = (pts @ R_ref)[:, 2].std()
        z_ours = (pts @ R_ours)[:, 2].std()
        np.testing.assert_allclose(z_ours, z_ref, rtol=1e-3)
        assert z_ours < 0.05


class TestCleanupEvalDepthParity:
    def test_matches_reference(self):
        from pytorch3d.implicitron.tools.depth_cleanup import (
            cleanup_eval_depth as ref_cleanup,
        )
        from pytorch3d.renderer import PerspectiveCameras as RefCameras
        from pytorch3d.structures import Pointclouds as RefPointclouds

        from pytorch3d_tpu.implicitron.tools.depth_cleanup import (
            cleanup_eval_depth,
        )
        from pytorch3d_tpu.renderer import PerspectiveCameras
        from pytorch3d_tpu.structures import Pointclouds

        rng = np.random.RandomState(7)
        B, H, W, P = 2, 16, 16, 100
        pts = rng.randn(B, P, 3).astype(np.float32) * 0.3
        pts[..., 2] += 3.0
        depth = (rng.rand(B, 1, H, W) * 2 + 2).astype(np.float32)
        mask = (rng.rand(B, 1, H, W) > 0.3).astype(np.float32)

        ref = ref_cleanup(
            RefPointclouds(points=torch.from_numpy(pts)),
            RefCameras(focal_length=1.0, R=torch.eye(3)[None].repeat(B, 1, 1),
                       T=torch.zeros(B, 3)),
            torch.from_numpy(depth),
            torch.from_numpy(mask),
            sigma=0.5,
        )
        ours = cleanup_eval_depth(
            Pointclouds.create(jnp.asarray(pts)),
            PerspectiveCameras.create(
                focal_length=1.0,
                R=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                T=jnp.zeros((B, 3)),
            ),
            jnp.asarray(depth),
            jnp.asarray(mask),
            sigma=0.5,
        )
        # binary masks: require exact agreement on > 99% of pixels
        agree = (np.asarray(ours) == t2n(ref)).mean()
        assert agree > 0.99, agree


class TestModelIOHelpers:
    def test_paths(self):
        from pytorch3d_tpu.implicitron.tools import model_io

        stem = "/tmp/exp/model_epoch_00000003"
        assert model_io.get_model_path(stem) == stem
        assert model_io.get_optimizer_path(stem) == stem + "_opt"
        assert model_io.get_stats_path(stem) == stem + "_stats.jgz"

    def test_save_load_stats_gzip(self, tmp_path):
        from pytorch3d_tpu.implicitron.tools import model_io
        from pytorch3d_tpu.implicitron.tools.stats import Stats

        s = Stats(log_vars=["objective"])
        s.new_epoch()
        s.update({"objective": 1.5})
        fl = str(tmp_path / "model_epoch_00000001")
        flstats = model_io.save_stats(s, fl)
        assert flstats.endswith(".jgz") and os.path.isfile(flstats)
        # actually gzipped
        import gzip

        with gzip.open(flstats, "rt") as f:
            assert "objective" in f.read()
        s2 = model_io.load_stats(flstats)
        assert s2 is not None and s2.epoch == s.epoch
        assert model_io.load_stats(str(tmp_path / "nope.jgz")) is None

    def test_save_model_roundtrip(self, tmp_path):
        from pytorch3d_tpu.implicitron.tools import model_io

        params = {"w": jnp.ones((3, 3))}
        fl = str(tmp_path / "model_epoch_00000002")
        flstats, flmodel = model_io.save_model(params, None, fl)
        assert os.path.exists(flmodel)


class TestMiscTools:
    def test_timer(self, capsys):
        from pytorch3d_tpu.implicitron.tools.utils import Timer

        with Timer("unit") as t:
            pass
        assert t.elapsed is not None and t.elapsed >= 0
        assert "unit time" in capsys.readouterr().out

    def test_device_shims(self):
        from pytorch3d_tpu.implicitron.tools.utils import (
            dataclass_to_cpu_,
            dataclass_to_cuda_,
            dict_to_cpu,
            dict_to_cuda,
        )

        d = {"a": 1}
        assert dict_to_cuda(d) == d and dict_to_cpu(d) == d
        assert dataclass_to_cuda_(d) is d and dataclass_to_cpu_(d) is d

    def test_stats_json_encoder(self):
        import json

        from pytorch3d_tpu.implicitron.tools.stats import (
            AverageMeter,
            StatsJSONEncoder,
        )

        m = AverageMeter()
        m.update(2.0)
        out = json.dumps({"m": m}, cls=StatsJSONEncoder)
        assert "history" in out
        with pytest.raises(TypeError):
            json.dumps({"x": object()}, cls=StatsJSONEncoder)

    def test_preprocess_input_and_weighted_losses(self):
        from pytorch3d_tpu.implicitron.models.utils import (
            preprocess_input,
            weighted_sum_losses,
        )

        img = jnp.ones((1, 4, 4, 3)) * 0.5
        fg = jnp.concatenate(
            [jnp.ones((1, 4, 2, 1)), jnp.zeros((1, 4, 2, 1))], axis=2
        )
        out_img, out_fg, _ = preprocess_input(
            img, fg, None, True, False, 0.5, (0.0, 0.0, 0.0)
        )
        assert float(out_img[0, 0, -1].sum()) == 0.0  # bg masked to black
        assert float(out_img[0, 0, 0].sum()) > 0
        loss = weighted_sum_losses(
            {"a": jnp.asarray(2.0), "b": jnp.asarray(3.0)},
            {"a": 1.0, "b": 0.5, "c": 2.0},
        )
        assert float(loss) == 3.5
        with pytest.warns(UserWarning):
            assert weighted_sum_losses({"a": jnp.asarray(1.0)}, {"z": 1.0}) is None
