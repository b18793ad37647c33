"""Tests for pulsar, splatter shader, fisheye cameras, GLB IO, SQL dataset,
implicitron trainer e2e, point-cloud tools, camera utils."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    FishEyeCameras,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    SplatterPhongShader,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex
from pytorch3d_tpu.renderer.points.pulsar import Renderer as PulsarRenderer
from pytorch3d_tpu.utils import ico_sphere


class TestPulsar:
    def test_occlusion_and_color(self):
        rend = PulsarRenderer(32, 32, 10)
        pos = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 5.0]])
        col = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        rad = jnp.asarray([0.4, 0.4])
        cam = jnp.asarray([0, 0, 0, 0, 0, 0, 0.1, 0.2], jnp.float32)
        img = rend(pos, col, rad, cam, gamma=1e-2, max_depth=10.0, min_depth=0.1)
        assert float(img[16, 16, 0]) > 0.5  # near red sphere wins
        assert float(img[16, 16, 1]) < 0.5

    def test_gamma_softens(self):
        rend = PulsarRenderer(16, 16, 4)
        pos = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 3.5]])
        col = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        rad = jnp.asarray([0.5, 0.5])
        cam = jnp.asarray([0, 0, 0, 0, 0, 0, 0.1, 0.2], jnp.float32)
        hard = rend(pos, col, rad, cam, gamma=1e-3, max_depth=10.0, min_depth=0.1)
        soft = rend(pos, col, rad, cam, gamma=1.0, max_depth=10.0, min_depth=0.1)
        # soft blending mixes more green into the center than hard
        assert float(soft[8, 8, 1]) > float(hard[8, 8, 1])

    def test_grad(self):
        rend = PulsarRenderer(16, 16, 4)
        pos = jnp.asarray([[0.1, 0.0, 3.0]])
        cam = jnp.asarray([0, 0, 0, 0, 0, 0, 0.1, 0.2], jnp.float32)

        def loss(p):
            img = rend(p, jnp.ones((1, 3)), jnp.asarray([0.5]), cam,
                       gamma=0.1, max_depth=10.0, min_depth=0.1,
                       bg_col=jnp.zeros((3,)))
            return jnp.sum(img[:, :8])  # left half

        g = jax.grad(loss)(pos)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestSplatterShader:
    def test_render_and_grad(self):
        mesh = ico_sphere(1)
        mesh = mesh.replace(
            textures=TexturesVertex.create(mesh.verts_padded() * 0.5 + 0.5)
        )
        R, T = look_at_view_transform(dist=2.7)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        renderer = MeshRenderer(
            MeshRasterizer(
                cams, RasterizationSettings(image_size=32, faces_per_pixel=2)
            ),
            SplatterPhongShader(
                cameras=cams, lights=PointLights.create(location=[[0, 0, -3]])
            ),
        )
        img = renderer(mesh)
        assert img.shape == (1, 32, 32, 4)
        assert float(img[..., 3].max()) > 0.9

        g = jax.grad(
            lambda v: jnp.sum(renderer(mesh.update_padded(v)))
        )(mesh.verts_padded())
        assert np.isfinite(np.asarray(g)).all()


class TestFishEye:
    def test_project_unproject(self):
        fe = FishEyeCameras.create(
            focal_length=300.0,
            principal_point=(320.0, 240.0),
            radial_params=((0.05, 0.01, 0.0, 0.0, 0.0, 0.0),),
        )
        pts = jnp.asarray(
            np.random.RandomState(0).rand(1, 12, 3).astype(np.float32)
            + np.asarray([0, 0, 2.0], np.float32)
        )
        proj = fe.transform_points(pts)
        # reference contract: transform returns z=1 (fisheyecameras.py:229);
        # the caller supplies the depth to unproject at.
        proj_depth = proj.at[..., 2].set(pts[..., 2])
        unproj = fe.unproject_points(proj_depth, world_coordinates=False)
        np.testing.assert_allclose(
            np.asarray(unproj), np.asarray(pts), atol=1e-4
        )

    def test_positive_k0_increases_radius(self):
        # radial polynomial with positive k0 pushes points outward
        # relative to the undistorted equidistant map (k == 0)
        eq = FishEyeCameras.create(
            focal_length=1.0, principal_point=(0.0, 0.0),
            radial_params=((0.0,) * 6,),
            use_tangential=False, use_thin_prism=False,
        )
        dist = FishEyeCameras.create(
            focal_length=1.0, principal_point=(0.0, 0.0),
            radial_params=((0.3, 0.0, 0.0, 0.0, 0.0, 0.0),),
            use_tangential=False, use_thin_prism=False,
        )
        pt = jnp.asarray([[[0.5, 0.0, 1.0]]])
        r0 = float(jnp.abs(eq.transform_points(pt)[0, 0, 0]))
        r1 = float(jnp.abs(dist.transform_points(pt)[0, 0, 0]))
        assert r1 > r0
        # and use_radial=False degrades to the pinhole model (ref :199)
        pin = FishEyeCameras.create(
            focal_length=1.0, principal_point=(0.0, 0.0),
            use_radial=False, use_tangential=False, use_thin_prism=False,
        )
        assert abs(float(pin.transform_points(pt)[0, 0, 0]) - 0.5) < 1e-6


class TestTrainerE2E:
    def test_experiment_runs_and_resumes(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from projects.implicitron_trainer.experiment import (
            Experiment,
            get_default_args,
        )

        cfg = get_default_args(Experiment)
        cfg["exp_dir"] = str(tmp_path)
        cfg["model_args"] = dict(
            render_image_width=16, render_image_height=16, num_passes=1,
            chunk_size_grid=0,
            raysampler_args=dict(
                n_pts_per_ray_training=4, n_pts_per_ray_evaluation=4,
                n_rays_per_image_sampled_from_mask=16, scene_extent=3.0,
            ),
            implicit_function_args=dict(
                n_hidden_neurons_xyz=8, n_hidden_neurons_dir=8,
                n_layers_xyz=2, append_xyz=(1,),
            ),
        )
        cfg["dataset_args"] = dict(num_views=4, resolution=16)
        cfg["training_loop_args"]["max_epochs"] = 1
        Experiment(**cfg).run()
        assert any(
            f.startswith("model_epoch_") for f in os.listdir(tmp_path)
        )
        # resume for one more epoch
        cfg["training_loop_args"]["max_epochs"] = 2
        Experiment(**cfg).run()


class TestPointCloudTools:
    def test_rgbd_unproject_and_render(self):
        from pytorch3d_tpu.implicitron.tools.point_cloud_utils import (
            get_rgbd_point_cloud,
            render_point_cloud_pytorch3d,
        )

        R, T = look_at_view_transform(dist=3.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        img = jnp.ones((1, 16, 16, 3)) * 0.6
        depth = jnp.full((1, 16, 16, 1), 3.0)
        pc = get_rgbd_point_cloud(cams, img, depth)
        assert pc.points_padded().shape[1] == 256
        imgs, mask = render_point_cloud_pytorch3d(
            cams, pc, render_size=(16, 16), point_radius=0.1
        )
        assert imgs.shape == (1, 16, 16, 3)
        assert float(mask.sum()) > 0


class TestRasterizeMC:
    """reference implicitron/tools/rasterize_mc.py — radius splat via the
    point rasterizer (not nearest-pixel)."""

    def test_radius_splat(self):
        from pytorch3d_tpu.implicitron.tools.rasterize_mc import (
            rasterize_mc_samples,
        )

        xys = jnp.asarray([[[0.0, 0.0], [0.5, 0.5]]])  # center + upper-left
        feats = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
        img, mask = rasterize_mc_samples(xys, feats, (64, 64), radius=0.2)
        assert img.shape == (1, 64, 64, 3) and mask.shape == (1, 64, 64, 1)
        covered = float(jnp.sum(mask > 0))
        # radius 0.2 on a 64px NDC span of 2 -> ~6.4px radius disc per point
        assert 2 * 3.14 * 10 < covered < 2 * 3.14 * 100
        # red disc at image center
        assert float(img[0, 32, 32, 0]) > 0.9
        # green disc up-left of center (pytorch3d NDC: +X left, +Y up)
        assert float(img[0, 16, 16, 1]) > 0.9

    def test_sparse_ray_bundle_packed(self):
        from pytorch3d_tpu.implicitron.models.renderer.base import (
            ImplicitronRayBundle,
        )
        from pytorch3d_tpu.implicitron.tools.rasterize_mc import (
            rasterize_sparse_ray_bundle,
        )

        R = 20
        key = jax.random.PRNGKey(0)
        xys = jax.random.uniform(key, (R, 1, 2), minval=-0.8, maxval=0.8)
        ids = jnp.asarray([0] * 12 + [1] * 8)
        bundle = ImplicitronRayBundle(
            origins=jnp.zeros((R, 1, 3)),
            directions=jnp.zeros((R, 1, 3)),
            lengths=jnp.zeros((R, 1, 4)),
            xys=xys,
            camera_ids=ids,
            camera_counts=jnp.asarray([12, 8]),
        )
        feats = jnp.ones((R, 1, 3)) * 0.7
        depth = jnp.ones((R, 1, 1)) * 2.0
        img, dep, msk = rasterize_sparse_ray_bundle(bundle, feats, (32, 32), depth)
        assert img.shape == (2, 32, 32, 3)
        assert dep.shape == (2, 32, 32, 1)
        assert msk.shape == (2, 32, 32, 1)
        # both cameras got some splats; alpha-normalized depth == 2
        for ci in range(2):
            on = np.asarray(msk[ci, ..., 0]) > 0.5
            assert on.sum() > 0
            d = np.asarray(dep[ci, ..., 0])[on] / np.asarray(msk[ci, ..., 0])[on]
            assert np.allclose(d, 2.0, atol=1e-3)


class TestOpenCVConversions:
    """reference renderer/camera_conversions.py — (R, t, K) round trip and
    projection agreement with an explicit OpenCV pinhole projection."""

    def _opencv_setup(self):
        from pytorch3d_tpu.transforms import axis_angle_to_matrix

        key = jax.random.PRNGKey(0)
        R = axis_angle_to_matrix(jnp.asarray([[0.1, -0.2, 0.15]]))
        tvec = jnp.asarray([[0.2, -0.1, 3.0]])
        K = jnp.asarray(
            [[[120.0, 0.0, 33.0], [0.0, 110.0, 28.0], [0.0, 0.0, 1.0]]]
        )
        image_size = jnp.asarray([[60, 70]])  # (h, w)
        return R, tvec, K, image_size

    def test_round_trip(self):
        from pytorch3d_tpu.renderer.camera_conversions import (
            cameras_from_opencv_projection,
            opencv_from_cameras_projection,
        )

        R, tvec, K, hw = self._opencv_setup()
        cams = cameras_from_opencv_projection(R, tvec, K, hw)
        R2, t2, K2 = opencv_from_cameras_projection(cams, hw)
        assert np.allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        assert np.allclose(np.asarray(tvec), np.asarray(t2), atol=1e-5)
        assert np.allclose(np.asarray(K), np.asarray(K2), atol=1e-4)

    def test_projection_matches_opencv_pinhole(self):
        from pytorch3d_tpu.renderer.camera_conversions import (
            cameras_from_opencv_projection,
        )

        R, tvec, K, hw = self._opencv_setup()
        pts = jnp.asarray([[[0.3, -0.2, 1.0], [-0.4, 0.5, 2.0], [0.0, 0.0, 1.5]]])
        # explicit OpenCV projection: x_cam = R @ x + t; pix = K @ (x/z)
        cam_pts = jnp.einsum("nij,npj->npi", R, pts) + tvec[:, None]
        pix_cv = jnp.einsum("nij,npj->npi", K, cam_pts / cam_pts[..., 2:])[..., :2]
        # ours: project to NDC then NDC -> screen
        cams = cameras_from_opencv_projection(R, tvec, K, hw)
        ndc = cams.transform_points(pts)[..., :2]
        h, w = 60.0, 70.0
        s = min(h, w) / 2.0
        px = -ndc[..., 0] * s + w / 2.0
        py = -ndc[..., 1] * s + h / 2.0
        ours = jnp.stack([px, py], axis=-1)
        assert np.allclose(np.asarray(ours), np.asarray(pix_cv), atol=1e-3)


class TestSoftGouraud:
    def test_renders(self):
        from pytorch3d_tpu.renderer import (
            MeshRasterizer,
            MeshRenderer,
            PointLights,
            RasterizationSettings,
        )
        from pytorch3d_tpu.renderer.mesh.shader import SoftGouraudShader
        from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(2)
        mesh = mesh.replace(
            textures=TexturesVertex.create(
                jnp.ones_like(mesh.verts_padded()) * 0.7
            )
        )
        R, T = look_at_view_transform(dist=2.7, elev=10.0, azim=20.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        renderer = MeshRenderer(
            MeshRasterizer(
                cams, RasterizationSettings(image_size=48, bin_size=0)
            ),
            SoftGouraudShader(
                cameras=cams,
                lights=PointLights.create(location=[[0.0, 1.0, -2.0]]),
            ),
        )
        img = np.asarray(renderer(mesh))[0]
        assert (img[..., 3] > 0.1).sum() > 200
        assert np.isfinite(img).all()


class TestDepthShadersAndFragments:
    def _setup(self):
        from pytorch3d_tpu.renderer import (
            MeshRasterizer,
            RasterizationSettings,
        )
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(2)
        R, T = look_at_view_transform(dist=2.7)
        cams = FoVPerspectiveCameras.create(R=R, T=T, znear=1.0, zfar=10.0)
        rast = MeshRasterizer(
            cams, RasterizationSettings(image_size=32, bin_size=0)
        )
        return mesh, cams, rast

    def test_hard_and_soft_depth(self):
        from pytorch3d_tpu.renderer import (
            HardDepthShader,
            MeshRenderer,
            SoftDepthShader,
        )

        mesh, cams, rast = self._setup()
        hard = np.asarray(
            MeshRenderer(rast, HardDepthShader(cameras=cams))(mesh)
        )[0]
        # sphere of radius ~1 at distance 2.7 -> front surface ~1.7
        assert 1.4 < hard[16, 16, 0] < 2.1
        assert hard[0, 0, 0] > hard[16, 16, 0]  # background farther
        # soft depth sigmoid-blends with the zfar background: center depth
        # is still strictly closer than the pure-background corner
        soft = np.asarray(
            MeshRenderer(rast, SoftDepthShader(cameras=cams))(mesh)
        )[0]
        assert soft[16, 16, 0] < soft[0, 0, 0]
        assert soft[16, 16, 0] > hard[16, 16, 0]  # blending pulls it back

    def test_renderer_with_fragments(self):
        from pytorch3d_tpu.renderer import (
            HardPhongShader,
            MeshRendererWithFragments,
            PointLights,
        )

        from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex

        mesh, cams, rast = self._setup()
        mesh = mesh.replace(
            textures=TexturesVertex.create(
                jnp.ones_like(mesh.verts_padded()) * 0.6
            )
        )
        renderer = MeshRendererWithFragments(
            rast,
            HardPhongShader(
                cameras=cams, lights=PointLights.create(location=[[0, 1, -2]])
            ),
        )
        images, fragments = renderer(mesh)
        assert images.shape[-1] == 4
        assert fragments.pix_to_face.shape[:3] == (1, 32, 32)
        covered = np.asarray(fragments.pix_to_face[..., 0] >= 0)
        assert covered.sum() > 100
        # image coverage agrees with fragment coverage
        assert np.array_equal(covered, np.asarray(images[..., 3] > 0)[0] if covered.ndim == 2 else covered)


class TestNdcScreenTransforms:
    def test_round_trip(self):
        from pytorch3d_tpu.renderer import (
            get_ndc_to_screen_transform,
            get_screen_to_ndc_transform,
        )

        R, T = look_at_view_transform(dist=2.7)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        size = ((48, 64),)  # (h, w)
        pts = jnp.asarray([[[0.25, -0.5, 1.0], [-0.8, 0.3, 2.0]]])
        to_screen = get_ndc_to_screen_transform(
            cams, with_xyflip=True, image_size=size
        )
        back = get_screen_to_ndc_transform(
            cams, with_xyflip=True, image_size=size
        )
        screen = to_screen.transform_points(pts)
        ndc_again = back.transform_points(screen)
        assert np.allclose(np.asarray(ndc_again), np.asarray(pts), atol=1e-5)
        # NDC origin maps to image center
        center = to_screen.transform_points(jnp.zeros((1, 1, 3)))
        assert np.allclose(np.asarray(center[0, 0, :2]), [32.0, 24.0], atol=1e-4)


class TestAddPointcloudsToVolumes:
    def test_trilinear_splat(self):
        from pytorch3d_tpu.ops import add_pointclouds_to_volumes
        from pytorch3d_tpu.structures import Pointclouds, Volumes

        # one point at the volume center with a red feature
        pts = Pointclouds.create(
            jnp.zeros((1, 1, 3)),
            features=jnp.asarray([[[1.0, 0.0, 0.0]]]),
        )
        vols = Volumes.create(
            densities=jnp.zeros((1, 1, 8, 8, 8)),
            features=jnp.zeros((1, 3, 8, 8, 8)),
            voxel_size=2.0 / 8,
        )
        out = add_pointclouds_to_volumes(pts, vols)
        d = np.asarray(out.densities())
        f = np.asarray(out.features())
        assert d.sum() > 0.5  # mass deposited
        # red mass lands near the center voxels only
        red = f[0, 0]
        com = np.array(np.unravel_index(np.argmax(red), red.shape))
        assert np.all(np.abs(com - 3.5) <= 1.0)
        assert f[0, 1].max() == 0.0  # no green anywhere


class TestTensorProperties:
    """Broadcast/gather/index contract of the TensorProperties shim
    (reference renderer/utils.py:97-283)."""

    def _make(self):
        from pytorch3d_tpu.renderer.utils import TensorProperties

        return TensorProperties(
            a=jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]),
            b=2.5,  # scalar broadcasts to N=3
            c=[7.0, 8.0, 9.0],
            name="fixed",  # non-tensor attrs pass through
        )

    def test_broadcast_constructor(self):
        tp = self._make()
        assert len(tp) == 3 and not tp.isempty()
        assert tp.a.shape == (3, 2)
        assert tp.b.shape == (3,)
        np.testing.assert_allclose(np.asarray(tp.b), 2.5)
        assert tp.name == "fixed"

    def test_mismatched_batch_raises(self):
        from pytorch3d_tpu.renderer.utils import TensorProperties

        with np.testing.assert_raises(ValueError):
            TensorProperties(a=jnp.ones((3, 2)), b=jnp.ones((2,)))

    def test_getitem_int_and_slice(self):
        tp = self._make()
        one = tp[1]
        assert len(one) == 1
        np.testing.assert_allclose(np.asarray(one.a), [[3.0, 4.0]])
        np.testing.assert_allclose(np.asarray(one.c), [8.0])
        two = tp[1:3]
        assert len(two) == 2 and two.name == "fixed"
        # original untouched (immutable arrays, new instance)
        assert len(tp) == 3

    def test_gather_props(self):
        tp = self._make()
        idx = jnp.asarray([2, 0, 2, 1])
        tp.gather_props(idx)
        np.testing.assert_allclose(
            np.asarray(tp.c), [9.0, 7.0, 9.0, 8.0]
        )

    def test_clone_independent(self):
        tp = self._make()
        cl = tp.clone()
        cl.gather_props(jnp.asarray([0]))
        assert len(tp.a) == 3 and len(cl.a) == 1


class TestLegacyTexturesFactory:
    def test_dispatch(self):
        import warnings

        from pytorch3d_tpu.renderer import Textures, TexturesUV, TexturesVertex

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            t1 = Textures(verts_rgb=jnp.ones((1, 4, 3)))
            assert isinstance(t1, TexturesVertex)
            t2 = Textures(
                maps=jnp.ones((1, 8, 8, 3)),
                faces_uvs=jnp.zeros((1, 2, 3), jnp.int32),
                verts_uvs=jnp.zeros((1, 4, 2)),
            )
            assert isinstance(t2, TexturesUV)
        try:
            import warnings as w

            with w.catch_warnings():
                w.simplefilter("ignore")
                Textures()
            raised = False
        except ValueError:
            raised = True
        assert raised
