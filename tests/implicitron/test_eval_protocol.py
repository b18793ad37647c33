"""Evaluation-protocol parity tests.

Mirrors reference tests for evaluate_new_view_synthesis.py: reference key
set of eval_batch, best-scale depth error, LPIPS substitute ordering,
summarize/flatten aggregation with train/test + n_src binning.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.implicitron.dataset.frame_data import FrameData
from pytorch3d_tpu.implicitron.evaluation.evaluate_new_view_synthesis import (
    average_per_batch_results,
    eval_batch,
    flatten_nvs_results,
    summarize_nvs_eval_results,
)
from pytorch3d_tpu.implicitron.tools.lpips import LPIPSSubstitute
from pytorch3d_tpu.implicitron.tools.metric_utils import (
    calc_psnr,
    eval_depth,
    iou,
    rgb_l1,
)


def _batch(H=24, W=24, depth=True, noise=0.0, seed=0):
    key = jax.random.PRNGKey(seed)
    gt = jax.random.uniform(key, (1, H, W, 3))
    mask = jnp.zeros((1, H, W, 1)).at[:, 6:18, 6:18].set(1.0)
    dm = (
        jnp.where(mask > 0, 2.0 + gt[..., :1], 0.0) if depth else None
    )
    fd = FrameData(
        image_rgb=gt, fg_probability=mask, depth_map=dm,
        frame_type=["test_unseen", "test_known"],
    )
    pred = dict(
        images_render=jnp.clip(gt + noise, 0, 1),
        masks_render=mask,
        depths_render=(1.7 * dm if depth else None),  # scaled depth
    )
    return fd, pred


class TestEvalBatchKeys:
    def test_reference_key_set(self):
        fd, pred = _batch()
        r = eval_batch(fd, pred, lpips_model=LPIPSSubstitute())
        for k in [
            "iou", "psnr_masked", "rgb_l1_masked", "psnr_fg", "rgb_l1_fg",
            "depth_abs_fg", "psnr_full_image", "rgb_l1_full_image",
            "lpips_substitute_full_image", "lpips_substitute_masked", "meta",
        ]:
            assert k in r, f"missing {k}"
        # the substitute must NEVER populate the reference lpips keys
        assert "lpips_full_image" not in r and "lpips_masked" not in r
        assert r["meta"]["lpips_metric"] == "random-feature-substitute"
        assert r["meta"]["batch_size"] == 1
        assert r["meta"]["frame_type"] == "test_unseen"

    def test_best_scale_depth(self):
        # predicted depth is a scaled copy: best-scale alignment must
        # drive the error to ~0 (reference eval_depth get_best_scale)
        fd, pred = _batch()
        r = eval_batch(fd, pred)
        assert r["depth_abs_fg"] < 1e-4

    def test_perfect_prediction(self):
        fd, pred = _batch(noise=0.0)
        r = eval_batch(fd, pred)
        assert r["psnr_full_image"] > 60
        assert r["iou"] > 0.99

    def test_noise_ordering(self):
        fd, p0 = _batch(noise=0.0)
        _, p1 = _batch(noise=0.05)
        _, p2 = _batch(noise=0.15)
        r = [eval_batch(fd, p)["psnr_masked"] for p in (p0, p1, p2)]
        assert r[0] > r[1] > r[2]


class TestLPIPSSubstitute:
    def test_zero_on_identical_and_monotone(self):
        key = jax.random.PRNGKey(3)
        im = jax.random.uniform(key, (1, 3, 32, 32)) * 2 - 1
        m = LPIPSSubstitute()
        assert float(m.forward(im, im)) < 1e-10
        d_small = float(m.forward(im, jnp.clip(im + 0.05, -1, 1)))
        d_big = float(m.forward(im, jnp.clip(im + 0.4, -1, 1)))
        assert 0 < d_small < d_big

    def test_deterministic(self):
        key = jax.random.PRNGKey(4)
        a = jax.random.uniform(key, (1, 3, 16, 16))
        b = jnp.roll(a, 3, axis=-1)
        m = LPIPSSubstitute()
        assert float(m.forward(a, b)) == float(m.forward(a, b))


class TestSummarize:
    def _per_batch(self):
        out = []
        for i, (ft, n_src, psnr) in enumerate([
            ("test_unseen", 1, 20.0),
            ("test_unseen", 3, 24.0),
            ("train_unseen", 1, 30.0),
            ("train_unseen", 3, 34.0),
        ]):
            out.append({
                "psnr_masked": psnr,
                "meta": {"batch_size": n_src + 1, "frame_type": ft},
            })
        return out

    def test_multisequence_binning(self):
        flat, aux = summarize_nvs_eval_results(
            self._per_batch(), is_multisequence=True
        )
        # train/test split with n_src bins (reference :464)
        assert flat["psnr_masked|subset=test|diff=all"] == 22.0
        assert flat["psnr_masked|subset=train|diff=all"] == 32.0
        assert flat["psnr_masked|subset=test|n_src=1"] == 20.0
        assert flat["psnr_masked|subset=train|n_src=3"] == 34.0

    def test_camera_difficulty_binning(self):
        pb = self._per_batch()
        for r, d in zip(pb, [0.5, 0.975, 0.99, 0.99]):
            r["meta"]["camera_difficulty"] = d
        flat, _ = summarize_nvs_eval_results(pb, is_multisequence=False)
        assert flat["psnr_masked|subset=test|diff=hard"] == 20.0
        assert flat["psnr_masked|subset=test|diff=medium"] == 24.0
        assert flat["psnr_masked|subset=test|diff=easy"] == 32.0

    def test_average_with_nan(self):
        pb = [
            {"psnr": 10.0, "iou": None, "meta": {}},
            {"psnr": 20.0, "iou": 0.5, "meta": {}},
        ]
        avg = average_per_batch_results(pb)
        assert avg["psnr"] == 15.0
        assert avg["iou"] == 0.5


class TestMetricUtils:
    def test_psnr_identity(self):
        x = jnp.ones((2, 8, 8, 3)) * 0.3
        assert float(jnp.mean(calc_psnr(x, x))) >= 90.0

    def test_rgb_l1_masked(self):
        x = jnp.zeros((1, 4, 4, 3))
        y = jnp.ones((1, 4, 4, 3))
        m = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
        assert abs(float(rgb_l1(x, y, m)[0]) - 1.0) < 1e-6

    def test_iou_disjoint(self):
        a = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
        b = jnp.zeros((1, 4, 4, 1)).at[:, 2:].set(1.0)
        assert float(iou(a, b)) < 1e-3

    def test_eval_depth_disparity(self):
        gt = jnp.ones((1, 16, 16, 1)) * 2.0
        pred = jnp.ones((1, 16, 16, 1)) * 4.0
        mse, ab = eval_depth(pred, gt, get_best_scale=False, crop=1)
        np.testing.assert_allclose(np.asarray(ab), 2.0, atol=1e-5)
        mse2, ab2 = eval_depth(pred, gt, get_best_scale=True, crop=1)
        assert float(ab2[0]) < 1e-5
