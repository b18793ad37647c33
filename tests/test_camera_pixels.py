"""Pixel-perfect camera/rasterizer/raysampler conventions.

Port of reference tests/test_camera_pixels.py: the renderers operate in
an align_corners=False manner; these tests pin the exact pixel-center
conventions with a point placed at the center of a known pixel, for
both an NDC-space and a screen-space SfM camera (including a second
batch element whose principal point sits at the image corner).
"""

import numpy as np
import jax.numpy as jnp

from pytorch3d_tpu.renderer import (
    MeshRasterizer,
    NDCMultinomialRaysampler,
    PerspectiveCameras,
    PointsRasterizationSettings,
    PointsRasterizer,
    RasterizationSettings,
)
from pytorch3d_tpu.renderer.points.pulsar.unified import PulsarPointsRenderer
from pytorch3d_tpu.structures import Meshes, Pointclouds


class _CommonData:
    """Reference test_camera_pixels.py:31 data, verbatim semantics."""

    def __init__(self):
        self.H, self.W = 249, 125
        self.image_size = (self.H, self.W)
        self.camera_ndc = PerspectiveCameras.create(
            focal_length=1.0,
            image_size=(self.image_size,),
            in_ndc=True,
            T=jnp.asarray([[0.0, 0.0, 0.0], [-1.0, self.H / self.W, 0.0]]),
            principal_point=((-0.0, -0.0), (1.0, -self.H / self.W)),
        )
        self.camera_screen = PerspectiveCameras.create(
            focal_length=self.W / 2.0,
            principal_point=((self.W / 2.0, self.H / 2.0), (0.0, self.H)),
            image_size=(self.image_size,),
            T=jnp.asarray([[0.0, 0.0, 0.0], [-1.0, self.H / self.W, 0.0]]),
            in_ndc=False,
        )
        # 81 is more than half of 125, 113 is a bit less than half of 249
        self.x, self.y = 81, 113
        # center of pixel (81, 113), pixel (0, 0) is top left:
        # 81 is 38/2 pixels over the midpoint (125-1)/2=62, 38/125=0.304
        # 113 is 22/2 pixels under the midpoint (249-1)/2=124, 22/125=0.176
        self.point = [-0.304, 0.176, 1]


class TestPixels:
    def test_mesh(self):
        data = _CommonData()
        verts = jnp.asarray(
            [[-0.288, 0.192, 1], [-0.32, 0.192, 1], [-0.304, 0.144, 1]],
            jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(verts.mean(0)), np.asarray(data.point), atol=1e-6
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        meshes = Meshes.create(verts=[verts], faces=[faces]).extend(2)
        K = 2
        for camera in (data.camera_ndc, data.camera_screen):
            rasterizer = MeshRasterizer(
                cameras=camera,
                raster_settings=RasterizationSettings(
                    image_size=data.image_size, faces_per_pixel=K
                ),
            )
            bary = rasterizer(meshes).bary_coords
            assert bary.shape == (2,) + data.image_size + (K, 3)
            # the known pixel hits the centroid: bary = (1/3, 1/3, 1/3)
            np.testing.assert_allclose(
                np.asarray(bary[:, data.y, data.x, 0]),
                np.full((2, 3), 1 / 3.0),
                atol=1e-5,
            )

    def test_pointcloud(self):
        data = _CommonData()
        clouds = Pointclouds.create(
            points=[jnp.asarray([data.point], jnp.float32)]
        ).extend(2)
        P = 2
        for camera in (data.camera_ndc, data.camera_screen):
            rasterizer = PointsRasterizer(
                cameras=camera,
                raster_settings=PointsRasterizationSettings(
                    image_size=data.image_size,
                    radius=0.0001,
                    points_per_pixel=P,
                ),
            )
            idx = np.asarray(rasterizer(clouds).idx)
            assert idx.shape == (2,) + data.image_size + (P,)
            found = np.argwhere(idx != -1)
            assert found.shape == (2, 4)
            assert found[0].tolist() == [0, data.y, data.x, 0]
            assert found[1].tolist() == [1, data.y, data.x, 0]

    def test_pulsar(self):
        data = _CommonData()
        colorful_cloud = Pointclouds.create(
            points=[jnp.asarray([data.point], jnp.float32)],
            features=[jnp.ones((1, 3), jnp.float32)],
        ).extend(2)
        rasterizer = PointsRasterizer(
            cameras=data.camera_ndc,
            raster_settings=PointsRasterizationSettings(
                image_size=data.image_size, radius=0.0001, points_per_pixel=2
            ),
        )
        renderer = PulsarPointsRenderer(rasterizer=rasterizer)
        out = renderer(
            colorful_cloud,
            gamma=(0.1, 0.1),
            znear=(0.1, 0.1),
            zfar=(70, 70),
            bg_col=jnp.zeros((3,)),
        )
        assert out.shape == (2,) + data.image_size + (3,)
        # the single point renders exactly at the known pixel (first batch
        # element; the reference also only checks batch 0 here)
        found = np.argwhere(np.asarray(out[0, :, :, 0]) > 1e-3)
        assert found.shape == (1, 2)
        assert found[0].tolist() == [data.y, data.x]

    def test_raysampler(self):
        data = _CommonData()
        gridsampler = NDCMultinomialRaysampler(
            image_width=data.W,
            image_height=data.H,
            n_pts_per_ray=2,
            min_depth=1.0,
            max_depth=2.0,
        )
        for camera in (data.camera_ndc, data.camera_screen):
            bundle = gridsampler(camera)
            assert bundle.xys.shape == (2,) + data.image_size + (2,)
            assert bundle.directions.shape == (2,) + data.image_size + (3,)
            np.testing.assert_allclose(
                np.asarray(bundle.xys[:, data.y, data.x]),
                np.broadcast_to(np.asarray(data.point[:2]), (2, 2)),
                atol=1e-5,
            )
            # only batch 0 (batch 1's camera sits elsewhere)
            np.testing.assert_allclose(
                np.asarray(bundle.directions[0, data.y, data.x]),
                np.asarray(data.point),
                atol=1e-5,
            )

    def test_camera(self):
        data = _CommonData()
        points = jnp.asarray(
            [data.point, [0, 0, 1], [1, data.H / data.W, 1]], jnp.float32
        )
        for cameras in (data.camera_ndc, data.camera_screen):
            ndc_points = cameras.transform_points_ndc(points)
            screen_points = cameras.transform_points_screen(points)
            screen_noflip = cameras.transform_points_screen(
                points, with_xyflip=False
            )
            camera_points = cameras.transform_points(points)
            for b in range(2):
                np.testing.assert_allclose(
                    np.asarray(ndc_points[b]), np.asarray(points), atol=1e-5
                )
                np.testing.assert_allclose(
                    np.asarray(screen_points[b][0]),
                    [data.x + 0.5, data.y + 0.5, 1.0],
                    atol=1e-4,
                )
                np.testing.assert_allclose(
                    np.asarray(screen_noflip[b][0]),
                    [-(data.x + 0.5), -(data.y + 0.5), 1.0],
                    atol=1e-4,
                )
                np.testing.assert_allclose(
                    np.asarray(screen_points[b][1]),
                    [data.W / 2.0, data.H / 2.0, 1.0],
                    atol=1e-4,
                )
                np.testing.assert_allclose(
                    np.asarray(screen_points[b][2]),
                    [0.0, 0.0, 1.0],
                    atol=1e-4,
                )
                if cameras.in_ndc():
                    np.testing.assert_allclose(
                        np.asarray(camera_points[b]),
                        np.asarray(ndc_points[b]),
                        atol=1e-5,
                    )
                else:
                    # reference test_camera_pixels.py:246 documents the
                    # screen-camera transform_points quirk
                    sp = np.asarray(screen_points[b])
                    if b == 0:
                        wanted = np.stack(
                            [data.W - sp[:, 0], data.H - sp[:, 1],
                             np.ones(3)], axis=1,
                        )
                    else:
                        wanted = np.stack(
                            [-sp[:, 0], 2 * data.H - sp[:, 1], np.ones(3)],
                            axis=1,
                        )
                    np.testing.assert_allclose(
                        np.asarray(camera_points[b]), wanted, atol=1e-4
                    )
