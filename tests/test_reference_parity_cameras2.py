"""Camera conventions parity vs the reference on NON-SQUARE images and
screen-space transforms — the classic convention-bug surface the round-1
suite only covered for square images.

Compares transform_points_ndc / transform_points_screen for
FoVPerspective, FoVOrthographic, Perspective(SfM) and Orthographic
cameras against the reference torch implementations on identical inputs,
plus the in_ndc=False (screen-space-intrinsics) PerspectiveCameras path.
"""

import sys

import numpy as np

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def _pts(n=40, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    pts[:, 2] = rng.uniform(2.0, 6.0, n).astype(np.float32)
    return pts


def _rt(seed=1):
    from pytorch3d.renderer import look_at_view_transform as ref_lavt

    R, T = ref_lavt(dist=3.0, elev=17.0, azim=42.0)
    return R, T


class TestNonSquareScreenTransforms:
    def _compare(self, ref_cam, my_cam, image_size):
        pts = _pts()
        ndc_r = t2n(
            ref_cam.transform_points_ndc(
                torch.tensor(pts)[None], image_size=(image_size,)
            )
        )[0]
        ndc_m = np.asarray(
            my_cam.transform_points_ndc(
                jnp.asarray(pts)[None], image_size=image_size
            )
        )[0]
        np.testing.assert_allclose(ndc_m[:, :2], ndc_r[:, :2], atol=2e-4)

        scr_r = t2n(
            ref_cam.transform_points_screen(
                torch.tensor(pts)[None], image_size=(image_size,)
            )
        )[0]
        scr_m = np.asarray(
            my_cam.transform_points_screen(
                jnp.asarray(pts)[None], image_size=image_size
            )
        )[0]
        np.testing.assert_allclose(scr_m[:, :2], scr_r[:, :2], atol=2e-2)

    def test_fov_perspective_nonsquare(self):
        from pytorch3d.renderer import FoVPerspectiveCameras as RefCam

        from pytorch3d_tpu.renderer import FoVPerspectiveCameras

        R, T = _rt()
        ref = RefCam(R=R, T=T, fov=55.0)
        mine = FoVPerspectiveCameras.create(
            R=jnp.asarray(t2n(R)), T=jnp.asarray(t2n(T)), fov=55.0
        )
        for size in [(120, 248), (248, 120), (64, 64)]:
            self._compare(ref, mine, size)

    def test_fov_orthographic_nonsquare(self):
        from pytorch3d.renderer import FoVOrthographicCameras as RefCam

        from pytorch3d_tpu.renderer import FoVOrthographicCameras

        R, T = _rt()
        ref = RefCam(R=R, T=T)
        mine = FoVOrthographicCameras.create(
            R=jnp.asarray(t2n(R)), T=jnp.asarray(t2n(T))
        )
        for size in [(96, 200), (200, 96)]:
            self._compare(ref, mine, size)

    def test_sfm_perspective_nonsquare(self):
        from pytorch3d.renderer import PerspectiveCameras as RefCam

        from pytorch3d_tpu.renderer import PerspectiveCameras

        R, T = _rt()
        fl = torch.tensor([[1.7, 1.9]])
        pp = torch.tensor([[0.05, -0.08]])
        ref = RefCam(R=R, T=T, focal_length=fl, principal_point=pp)
        mine = PerspectiveCameras.create(
            R=jnp.asarray(t2n(R)), T=jnp.asarray(t2n(T)),
            focal_length=jnp.asarray(t2n(fl)),
            principal_point=jnp.asarray(t2n(pp)),
        )
        for size in [(144, 256), (256, 144)]:
            self._compare(ref, mine, size)

    def test_orthographic_nonsquare(self):
        from pytorch3d.renderer import OrthographicCameras as RefCam

        from pytorch3d_tpu.renderer import OrthographicCameras

        R, T = _rt()
        ref = RefCam(R=R, T=T, focal_length=torch.tensor([[0.9, 1.1]]))
        mine = OrthographicCameras.create(
            R=jnp.asarray(t2n(R)), T=jnp.asarray(t2n(T)),
            focal_length=jnp.asarray([[0.9, 1.1]]),
        )
        for size in [(100, 180), (180, 100)]:
            self._compare(ref, mine, size)


class TestScreenSpaceIntrinsics:
    def test_perspective_in_ndc_false(self):
        """PerspectiveCameras with in_ndc=False carry pixel-space
        intrinsics; get_ndc_camera_transform must rescale them
        identically to the reference (cameras.py:1049)."""
        from pytorch3d.renderer import PerspectiveCameras as RefCam

        from pytorch3d_tpu.renderer import PerspectiveCameras

        R, T = _rt()
        H, W = 120, 200
        fl = torch.tensor([[150.0, 150.0]])
        pp = torch.tensor([[95.0, 68.0]])
        img = torch.tensor([[H, W]])
        ref = RefCam(
            R=R, T=T, focal_length=fl, principal_point=pp,
            in_ndc=False, image_size=img,
        )
        mine = PerspectiveCameras.create(
            R=jnp.asarray(t2n(R)), T=jnp.asarray(t2n(T)),
            focal_length=jnp.asarray(t2n(fl)),
            principal_point=jnp.asarray(t2n(pp)),
            in_ndc=False, image_size=jnp.asarray([[H, W]]),
        )
        pts = _pts()
        ndc_r = t2n(
            ref.transform_points_ndc(
                torch.tensor(pts)[None], image_size=((H, W),)
            )
        )[0]
        ndc_m = np.asarray(
            mine.transform_points_ndc(
                jnp.asarray(pts)[None], image_size=(H, W)
            )
        )[0]
        np.testing.assert_allclose(ndc_m[:, :2], ndc_r[:, :2], atol=3e-4)
