"""Implicitron tools: Stats, circle fitting, VideoWriter, camera utils
(reference tests/implicitron/{test_circle_fitting,test_video_writer}.py,
tools/stats.py)."""

import os

import jax.numpy as jnp
import numpy as np


class TestStats:
    def test_update_and_persistence(self, tmp_path):
        from pytorch3d_tpu.implicitron.tools.stats import Stats

        stats = Stats(log_vars=["loss", "psnr"])
        stats.new_epoch()
        for i in range(3):
            stats.update({"loss": 1.0 - 0.1 * i, "psnr": 10.0 + i}, stat_set="train")
        m = stats.stats["train"]["loss"]
        assert abs(m.get_epoch_averages()[-1] - 0.9) < 1e-6
        p = str(tmp_path / "stats.json")
        stats.save(p)
        loaded = Stats.load(p)
        assert abs(
            loaded.stats["train"]["psnr"].get_epoch_averages()[-1] - 11.0
        ) < 1e-6

    def test_average_meter(self):
        from pytorch3d_tpu.implicitron.tools.stats import AverageMeter

        m = AverageMeter()
        m.update(2.0, n=1)
        m.update(4.0, n=3)
        assert abs(m.avg - 3.5) < 1e-6


class TestCircleFitting:
    def test_fit_circle_2d(self):
        from pytorch3d_tpu.implicitron.tools.circle_fitting import (
            fit_circle_in_2d,
        )

        angles = jnp.linspace(0, 2 * jnp.pi, 40, endpoint=False)
        pts = jnp.stack(
            [3.0 + 2.0 * jnp.cos(angles), -1.0 + 2.0 * jnp.sin(angles)], -1
        )
        c = fit_circle_in_2d(pts, n_points=8)
        assert np.allclose(np.asarray(c.center), [3.0, -1.0], atol=1e-4)
        assert abs(float(c.radius) - 2.0) < 1e-4
        assert c.generated_points.shape == (8, 2)
        d = np.linalg.norm(
            np.asarray(c.generated_points) - np.asarray(c.center), axis=-1
        )
        assert np.allclose(d, 2.0, atol=1e-4)

    def test_fit_circle_3d(self):
        from pytorch3d_tpu.implicitron.tools.circle_fitting import (
            fit_circle_in_3d,
        )

        # circle of radius 1.5 in a tilted plane
        angles = jnp.linspace(0, 2 * jnp.pi, 30, endpoint=False)
        ring = jnp.stack(
            [1.5 * jnp.cos(angles), 1.5 * jnp.sin(angles), jnp.zeros_like(angles)],
            -1,
        )
        # rotate plane about x by 30 deg, shift
        th = jnp.pi / 6
        R = jnp.asarray(
            [
                [1.0, 0.0, 0.0],
                [0.0, jnp.cos(th), -jnp.sin(th)],
                [0.0, jnp.sin(th), jnp.cos(th)],
            ]
        )
        pts = ring @ R.T + jnp.asarray([1.0, 2.0, 3.0])
        c = fit_circle_in_3d(pts, n_points=12)
        assert abs(float(c.radius) - 1.5) < 1e-4
        assert np.allclose(np.asarray(c.center), [1.0, 2.0, 3.0], atol=1e-4)
        # normal is the rotated z axis (either sign)
        n_expect = np.asarray(R @ jnp.asarray([0.0, 0.0, 1.0]))
        n_got = np.asarray(c.normal)
        assert min(
            np.linalg.norm(n_got - n_expect), np.linalg.norm(n_got + n_expect)
        ) < 1e-4
        # generated points lie on the original circle
        d = np.linalg.norm(
            np.asarray(c.generated_points) - np.asarray(c.center), axis=-1
        )
        assert np.allclose(d, 1.5, atol=1e-4)


class TestVideoWriter:
    def test_write_frames_gif_fallback(self, tmp_path):
        from pytorch3d_tpu.implicitron.tools.video_writer import VideoWriter

        out = str(tmp_path / "vid.gif")
        vw = VideoWriter(out_path=out, fps=4)
        for i in range(5):
            vw.write_frame(np.full((16, 16, 3), i / 5.0))
        path = vw.get_video()
        assert os.path.isfile(path)
        assert os.path.getsize(path) > 0


class TestEvalVideoTrajectory:
    def test_circular_fit_cameras(self):
        import jax.numpy as jnp

        from pytorch3d_tpu.implicitron.tools.eval_video_trajectory import (
            generate_eval_video_cameras,
        )
        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )

        R, T = look_at_view_transform(
            dist=3.0,
            elev=jnp.zeros(12),
            azim=jnp.linspace(0.0, 330.0, 12),
        )
        train_cams = FoVPerspectiveCameras.create(R=R, T=T)
        eval_cams = generate_eval_video_cameras(
            train_cams, n_eval_cams=20, trajectory_scale=1.0
        )
        centers = np.asarray(eval_cams.get_camera_center())
        assert centers.shape == (20, 3)
        # eval path stays on the training circle: radius 3 around origin
        r = np.linalg.norm(centers, axis=-1)
        assert np.allclose(r, 3.0, atol=0.1)
        # looks at the scene center: projecting the origin lands near NDC 0
        proj = np.asarray(
            eval_cams.transform_points(jnp.zeros((20, 1, 3)))
        )[:, 0, :2]
        assert np.abs(proj).max() < 0.15


class TestRotateOnSpot:
    def test_camera_center_fixed(self):
        import jax.numpy as jnp

        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )
        from pytorch3d_tpu.renderer.camera_utils import rotate_on_spot
        from pytorch3d_tpu.transforms import axis_angle_to_matrix

        R, T = look_at_view_transform(dist=2.5, elev=15.0, azim=40.0)
        rot = axis_angle_to_matrix(jnp.asarray([0.0, 0.3, 0.0]))
        R2, T2 = rotate_on_spot(R, T, rot)
        c1 = np.asarray(FoVPerspectiveCameras.create(R=R, T=T).get_camera_center())
        c2 = np.asarray(FoVPerspectiveCameras.create(R=R2, T=T2).get_camera_center())
        assert np.allclose(c1, c2, atol=1e-5)  # position unchanged
        assert not np.allclose(np.asarray(R), np.asarray(R2))  # orientation changed
