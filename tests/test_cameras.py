import math

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import (
    FoVOrthographicCameras,
    FoVPerspectiveCameras,
    OrthographicCameras,
    PerspectiveCameras,
    camera_position_from_spherical_angles,
    look_at_rotation,
    look_at_view_transform,
)


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


class TestLookAt:
    def test_camera_position_spherical(self):
        pos = camera_position_from_spherical_angles(2.0, 0.0, 0.0)
        assert_close(pos, jnp.array([[0.0, 0.0, 2.0]]), atol=1e-6)
        pos = camera_position_from_spherical_angles(2.0, 90.0, 0.0)
        assert_close(pos, jnp.array([[0.0, 2.0, 0.0]]), atol=1e-6)
        pos = camera_position_from_spherical_angles(2.0, 0.0, 90.0)
        assert_close(pos, jnp.array([[2.0, 0.0, 0.0]]), atol=1e-6)

    def test_look_at_rotation_orthonormal(self):
        R = look_at_rotation(jnp.array([[1.0, 2.0, 3.0]]))
        assert_close(R @ jnp.swapaxes(R, -1, -2), jnp.eye(3)[None], atol=1e-5)

    def test_look_at_view_transform_maps_camera_to_origin(self):
        R, T = look_at_view_transform(dist=2.7, elev=30.0, azim=45.0)
        C = camera_position_from_spherical_angles(2.7, 30.0, 45.0)
        # view coords of the camera center must be the origin
        view = jnp.einsum("nj,njk->nk", C, R) + T
        assert_close(view, jnp.zeros((1, 3)), atol=1e-5)
        # the at point (origin) should project to (0, 0, dist)
        at_view = jnp.einsum("nj,njk->nk", jnp.zeros((1, 3)), R) + T
        assert_close(at_view, jnp.array([[0.0, 0.0, 2.7]]), atol=1e-5)


class TestFoVPerspective:
    def test_projection_of_center_point(self):
        cam = FoVPerspectiveCameras.create(fov=60.0, znear=1.0, zfar=100.0)
        # point on the optical axis at z=2 projects to x=y=0
        pts = jnp.array([[0.0, 0.0, 2.0]])
        out = cam.get_projection_transform().transform_points(pts)
        assert_close(out[..., :2], jnp.zeros((1, 2)), atol=1e-6)

    def test_znear_zfar_map_to_01(self):
        cam = FoVPerspectiveCameras.create(fov=60.0, znear=1.0, zfar=100.0)
        pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 100.0]])
        out = cam.get_projection_transform().transform_points(pts)
        assert_close(out[:, 2], jnp.array([0.0, 1.0]), atol=1e-5)

    def test_fov_edge(self):
        # at fov=90, a point with x = z lands at NDC x = 1
        cam = FoVPerspectiveCameras.create(fov=90.0)
        pts = jnp.array([[2.0, 0.0, 2.0]])
        out = cam.get_projection_transform().transform_points(pts)
        assert_close(out[0, 0], 1.0, atol=1e-5)

    def test_unproject_roundtrip(self):
        R, T = look_at_view_transform(dist=3.0, elev=20.0, azim=10.0)
        cam = FoVPerspectiveCameras.create(R=R, T=T)
        pts = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 3)) * 0.3
        ndc = cam.transform_points(pts)
        # replace z with view-space depth for unprojection
        view = cam.get_world_to_view_transform().transform_points(pts)
        xy_depth = jnp.concatenate([ndc[..., :2], view[..., 2:]], axis=-1)
        back = cam.unproject_points(xy_depth, world_coordinates=True)
        assert_close(back, pts, atol=1e-3)

    def test_camera_center(self):
        R, T = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
        cam = FoVPerspectiveCameras.create(R=R, T=T)
        assert_close(cam.get_camera_center(), jnp.array([[0.0, 0.0, 2.0]]), atol=1e-5)

    def test_transform_points_screen(self):
        cam = FoVPerspectiveCameras.create()
        pts = jnp.array([[[0.0, 0.0, 5.0]]])
        out = cam.transform_points_screen(pts, image_size=((64, 64),))
        # optical axis maps to image center
        assert_close(out[0, 0, :2], jnp.array([32.0, 32.0]), atol=1e-4)


class TestFoVOrthographic:
    def test_projection(self):
        cam = FoVOrthographicCameras.create(znear=1.0, zfar=100.0)
        pts = jnp.array([[0.5, -0.5, 1.0]])
        out = cam.get_projection_transform().transform_points(pts)
        assert_close(out, jnp.array([[0.5, -0.5, 0.0]]), atol=1e-6)

    def test_unproject(self):
        cam = FoVOrthographicCameras.create()
        pts = jnp.array([[[0.2, 0.3, 5.0]]])
        ndc = cam.transform_points(pts)
        xy_depth = jnp.concatenate([ndc[..., :2], pts[..., 2:]], axis=-1)
        back = cam.unproject_points(xy_depth)
        assert_close(back, pts, atol=1e-4)


class TestSfMCameras:
    def test_perspective_projection(self):
        cam = PerspectiveCameras.create(focal_length=2.0)
        pts = jnp.array([[1.0, -1.0, 2.0]])
        out = cam.get_projection_transform().transform_points(pts)
        # x_ndc = fx X / Z = 2*1/2 = 1; z passthrough via w: out z = 1/z
        assert_close(out[0, :2], jnp.array([1.0, -1.0]), atol=1e-5)

    def test_transform_points_keeps_depth_convention(self):
        cam = PerspectiveCameras.create(focal_length=1.0)
        pts = jnp.array([[[0.5, 0.0, 4.0]]])
        ndc = cam.transform_points(pts)
        assert_close(ndc[0, 0, 0], 0.125, atol=1e-5)

    def test_unproject_perspective(self):
        cam = PerspectiveCameras.create(
            focal_length=1.5, principal_point=((0.1, -0.2),)
        )
        pts = jnp.array([[[0.3, 0.4, 2.0]]])
        proj = cam.transform_points(pts)
        xy_depth = jnp.concatenate([proj[..., :2], pts[..., 2:]], axis=-1)
        back = cam.unproject_points(xy_depth)
        assert_close(back, pts, atol=1e-4)

    def test_orthographic_projection(self):
        cam = OrthographicCameras.create(focal_length=2.0)
        pts = jnp.array([[0.5, -0.25, 7.0]])
        out = cam.get_projection_transform().transform_points(pts)
        assert_close(out, jnp.array([[1.0, -0.5, 7.0]]), atol=1e-5)

    def test_screen_space_camera(self):
        # screen-space camera: principal point at image center, f in pixels
        cam = PerspectiveCameras.create(
            focal_length=32.0,
            principal_point=((32.0, 32.0),),
            image_size=((64, 64),),
            in_ndc=False,
        )
        pts = jnp.array([[[0.0, 0.0, 3.0]]])
        ndc = cam.transform_points_ndc(pts)
        assert_close(ndc[0, 0, :2], jnp.zeros(2), atol=1e-5)
        screen = cam.transform_points_screen(pts)
        assert_close(screen[0, 0, :2], jnp.array([32.0, 32.0]), atol=1e-4)

    def test_batched(self):
        cam = PerspectiveCameras.create(
            focal_length=jnp.array([1.0, 2.0]),
        )
        assert len(cam) == 2
        pts = jnp.array([[[1.0, 1.0, 2.0]]] * 2)
        out = cam.get_projection_transform().transform_points(pts)
        assert_close(out[0, 0, 0] * 2, out[1, 0, 0], atol=1e-5)
