"""All-camera-type method sweep vs the reference at random parameters.

For each camera family (FoV persp/ortho, SfM persp/ortho in NDC and
screen space) compares: camera centers, world-to-view and full
projection of random points, transform_points_screen, unproject_points
(world and camera coords), is_perspective, and batched indexing —
mirroring the scenario breadth of reference tests/test_cameras.py.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pytorch3d.renderer import (  # noqa: E402
    FoVOrthographicCameras as RefFoVOrtho,
    FoVPerspectiveCameras as RefFoVPersp,
    OrthographicCameras as RefOrtho,
    PerspectiveCameras as RefPersp,
)
from pytorch3d.renderer.cameras import (  # noqa: E402
    look_at_view_transform as ref_look_at,
)

from pytorch3d_tpu.renderer import (  # noqa: E402
    FoVOrthographicCameras,
    FoVPerspectiveCameras,
    OrthographicCameras,
    PerspectiveCameras,
    look_at_view_transform,
)


def t2n(x):
    return x.detach().cpu().numpy()


RNG = np.random.RandomState(42)
N = 3
R_np, T_np = None, None


def _extrinsics():
    global R_np, T_np
    if R_np is None:
        R, T = look_at_view_transform(
            dist=jnp.asarray(RNG.uniform(2.0, 4.0, N).astype(np.float32)),
            elev=jnp.asarray(RNG.uniform(-40, 40, N).astype(np.float32)),
            azim=jnp.asarray(RNG.uniform(-90, 90, N).astype(np.float32)),
        )
        R_np, T_np = np.asarray(R), np.asarray(T)
    return R_np, T_np


def _pairs():
    """(ours, ref, needs_from_ndc) constructors for each family."""
    R, T = _extrinsics()
    tR, tT = torch.from_numpy(R), torch.from_numpy(T)
    fl = RNG.uniform(1.5, 3.0, (N, 2)).astype(np.float32)
    pp = RNG.uniform(-0.2, 0.2, (N, 2)).astype(np.float32)
    img = np.tile([[128, 256]], (N, 1)).astype(np.float32)
    fl_s = fl * 64.0
    pp_s = pp * 32.0 + np.array([[128.0, 64.0]])

    out = {
        "fov_persp": (
            FoVPerspectiveCameras.create(
                fov=55.0, znear=0.5, zfar=50.0, R=jnp.asarray(R),
                T=jnp.asarray(T),
            ),
            RefFoVPersp(fov=55.0, znear=0.5, zfar=50.0, R=tR, T=tT),
        ),
        "fov_ortho": (
            FoVOrthographicCameras.create(
                znear=0.5, zfar=50.0, max_y=1.2, min_y=-1.2, max_x=1.5,
                min_x=-1.5, R=jnp.asarray(R), T=jnp.asarray(T),
            ),
            RefFoVOrtho(
                znear=0.5, zfar=50.0, max_y=1.2, min_y=-1.2, max_x=1.5,
                min_x=-1.5, R=tR, T=tT,
            ),
        ),
        "sfm_persp_ndc": (
            PerspectiveCameras.create(
                focal_length=jnp.asarray(fl),
                principal_point=jnp.asarray(pp),
                R=jnp.asarray(R), T=jnp.asarray(T),
            ),
            RefPersp(
                focal_length=torch.from_numpy(fl),
                principal_point=torch.from_numpy(pp), R=tR, T=tT,
            ),
        ),
        "sfm_ortho_ndc": (
            OrthographicCameras.create(
                focal_length=jnp.asarray(fl),
                principal_point=jnp.asarray(pp),
                R=jnp.asarray(R), T=jnp.asarray(T),
            ),
            RefOrtho(
                focal_length=torch.from_numpy(fl),
                principal_point=torch.from_numpy(pp), R=tR, T=tT,
            ),
        ),
        "sfm_persp_screen": (
            PerspectiveCameras.create(
                focal_length=jnp.asarray(fl_s),
                principal_point=jnp.asarray(pp_s),
                R=jnp.asarray(R), T=jnp.asarray(T), in_ndc=False,
                image_size=jnp.asarray(img),
            ),
            RefPersp(
                focal_length=torch.from_numpy(fl_s),
                principal_point=torch.from_numpy(pp_s), R=tR, T=tT,
                in_ndc=False, image_size=torch.from_numpy(img),
            ),
        ),
        "sfm_ortho_screen": (
            OrthographicCameras.create(
                focal_length=jnp.asarray(fl_s),
                principal_point=jnp.asarray(pp_s),
                R=jnp.asarray(R), T=jnp.asarray(T), in_ndc=False,
                image_size=jnp.asarray(img),
            ),
            RefOrtho(
                focal_length=torch.from_numpy(fl_s),
                principal_point=torch.from_numpy(pp_s), R=tR, T=tT,
                in_ndc=False, image_size=torch.from_numpy(img),
            ),
        ),
    }
    return out


PAIRS = _pairs()
POINTS = RNG.uniform(-1.0, 1.0, (N, 13, 3)).astype(np.float32)
POINTS[..., 2] += 2.5  # keep points in front of every camera


class TestCameraMethodSweep:
    @pytest.mark.parametrize("kind", sorted(PAIRS))
    def test_camera_center(self, kind):
        ours, ref = PAIRS[kind]
        np.testing.assert_allclose(
            np.asarray(ours.get_camera_center()),
            t2n(ref.get_camera_center()),
            atol=1e-4,
        )

    @pytest.mark.parametrize("kind", sorted(PAIRS))
    def test_world_to_view(self, kind):
        ours, ref = PAIRS[kind]
        got = ours.get_world_to_view_transform().transform_points(
            jnp.asarray(POINTS)
        )
        want = ref.get_world_to_view_transform().transform_points(
            torch.from_numpy(POINTS)
        )
        np.testing.assert_allclose(np.asarray(got), t2n(want), atol=1e-5)

    @pytest.mark.parametrize("kind", sorted(PAIRS))
    def test_full_projection(self, kind):
        ours, ref = PAIRS[kind]
        got = ours.get_full_projection_transform().transform_points(
            jnp.asarray(POINTS)
        )
        want = ref.get_full_projection_transform().transform_points(
            torch.from_numpy(POINTS)
        )
        np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-4)

    @pytest.mark.parametrize("kind", sorted(PAIRS))
    def test_transform_points_screen(self, kind):
        ours, ref = PAIRS[kind]
        got = ours.transform_points_screen(
            jnp.asarray(POINTS), image_size=(128, 256)
        )
        want = ref.transform_points_screen(
            torch.from_numpy(POINTS), image_size=(128, 256)
        )
        np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-3)

    @pytest.mark.parametrize("kind", sorted(PAIRS))
    @pytest.mark.parametrize("world", [True, False])
    def test_unproject_points(self, kind, world):
        ours, ref = PAIRS[kind]
        pts = torch.from_numpy(POINTS)
        ndc = ref.transform_points(pts)
        xy_depth = torch.cat([ndc[..., :2], pts[..., 2:] * 0 + 3.0], dim=-1)
        if kind.startswith("fov"):
            # FoV cameras unproject from (x, y, z-in-NDC)
            xy_depth = ndc
        want = ref.unproject_points(xy_depth, world_coordinates=world)
        got = ours.unproject_points(
            jnp.asarray(t2n(xy_depth)), world_coordinates=world
        )
        np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-3)

    @pytest.mark.parametrize("kind", sorted(PAIRS))
    def test_is_perspective_and_getitem(self, kind):
        ours, ref = PAIRS[kind]
        assert ours.is_perspective() == ref.is_perspective()
        o1, r1 = ours[[1]], ref[[1]]
        np.testing.assert_allclose(
            np.asarray(o1.get_camera_center()),
            t2n(r1.get_camera_center()),
            atol=1e-4,
        )

    def test_look_at_matches_reference(self):
        eye = RNG.uniform(-3, 3, (2, 3)).astype(np.float32)
        at = RNG.uniform(-1, 1, (2, 3)).astype(np.float32)
        up = np.array([[0.0, 1.0, 0.0], [0.2, 0.9, 0.1]], np.float32)
        R, T = look_at_view_transform(
            eye=jnp.asarray(eye), at=jnp.asarray(at), up=jnp.asarray(up)
        )
        Rr, Tr = ref_look_at(
            eye=torch.from_numpy(eye),
            at=torch.from_numpy(at),
            up=torch.from_numpy(up),
        )
        np.testing.assert_allclose(np.asarray(R), t2n(Rr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T), t2n(Tr), atol=1e-5)
