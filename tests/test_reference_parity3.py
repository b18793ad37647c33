"""Reference-parity batch 3: mesh losses, raymarchers, point-cloud
normals, points->volumes splatting, struct utils, LinearWithRepeat,
Volumes coordinate transforms — all pure-torch reference paths that were
previously only self-tested."""

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


def _random_meshes(seed=0, n=3):
    """A small batch of heterogeneous ico-based meshes, jittered, built
    identically on both sides."""
    from pytorch3d.structures import Meshes as RefMeshes
    from pytorch3d.utils import ico_sphere as ref_ico

    from pytorch3d_tpu.structures import Meshes

    rng = np.random.RandomState(seed)
    vs, fs = [], []
    for i in range(n):
        m = ref_ico(i % 2)
        v = t2n(m.verts_packed()) * (1.0 + 0.2 * rng.rand()) + (
            0.05 * rng.randn(*m.verts_packed().shape)
        ).astype(np.float32)
        vs.append(v.astype(np.float32))
        fs.append(t2n(m.faces_packed()).astype(np.int64))
    ref = RefMeshes(
        verts=[torch.from_numpy(v) for v in vs],
        faces=[torch.from_numpy(f) for f in fs],
    )
    ours = Meshes.create(
        [jnp.asarray(v) for v in vs],
        [jnp.asarray(f.astype(np.int32)) for f in fs],
    )
    return ref, ours


class TestMeshLossParity:
    def test_mesh_edge_loss(self):
        from pytorch3d.loss import mesh_edge_loss as ref_loss

        from pytorch3d_tpu.loss import mesh_edge_loss

        ref, ours = _random_meshes()
        for target in (0.0, 0.2):
            close(
                mesh_edge_loss(ours, target_length=target),
                t2n(ref_loss(ref, target_length=target)),
            )

    @pytest.mark.parametrize("method", ["uniform", "cot", "cotcurv"])
    def test_mesh_laplacian_smoothing(self, method):
        from pytorch3d.loss import mesh_laplacian_smoothing as ref_loss

        from pytorch3d_tpu.loss import mesh_laplacian_smoothing

        ref, ours = _random_meshes(seed=1)
        close(
            mesh_laplacian_smoothing(ours, method=method),
            t2n(ref_loss(ref, method=method)),
            rtol=1e-3,
            atol=1e-4,
        )

    def test_mesh_normal_consistency(self):
        from pytorch3d.loss import mesh_normal_consistency as ref_loss

        from pytorch3d_tpu.loss import mesh_normal_consistency

        ref, ours = _random_meshes(seed=2)
        close(mesh_normal_consistency(ours), t2n(ref_loss(ref)), rtol=1e-3)


class TestRaymarcherParity:
    def _inputs(self, seed=0):
        rng = np.random.RandomState(seed)
        dens = rng.rand(2, 8, 16, 1).astype(np.float32) * 0.8
        feat = rng.rand(2, 8, 16, 3).astype(np.float32)
        return dens, feat

    def test_emission_absorption(self):
        from pytorch3d.renderer.implicit.raymarching import (
            EmissionAbsorptionRaymarcher as RefEA,
        )

        from pytorch3d_tpu.renderer.implicit.raymarching import (
            EmissionAbsorptionRaymarcher,
        )

        dens, feat = self._inputs()
        out_ref = RefEA()(torch.from_numpy(dens), torch.from_numpy(feat))
        out = EmissionAbsorptionRaymarcher()(
            jnp.asarray(dens), jnp.asarray(feat)
        )
        close(out, t2n(out_ref), rtol=1e-4)

    def test_absorption_only(self):
        from pytorch3d.renderer.implicit.raymarching import (
            AbsorptionOnlyRaymarcher as RefAO,
        )

        from pytorch3d_tpu.renderer.implicit.raymarching import (
            AbsorptionOnlyRaymarcher,
        )

        dens, _ = self._inputs(seed=3)
        out_ref = RefAO()(torch.from_numpy(dens))
        out = AbsorptionOnlyRaymarcher()(jnp.asarray(dens))
        close(out, t2n(out_ref), rtol=1e-4)


class TestPointsNormalsParity:
    def test_estimate_pointcloud_normals(self):
        # the reference path needs the native knn -> validate ours against
        # the analytic normal of a noisy plane instead (same symeig math,
        # reference ops/points_normals.py:17)
        from pytorch3d_tpu.ops import estimate_pointcloud_normals

        rng = np.random.RandomState(0)
        xy = rng.rand(1, 200, 2).astype(np.float32)
        z = 0.3 * xy[..., :1] - 0.2 * xy[..., 1:]
        pts = np.concatenate([xy, z], axis=-1)
        n_true = np.array([-0.3, 0.2, 1.0], np.float32)
        n_true /= np.linalg.norm(n_true)
        n_ours = np.asarray(
            estimate_pointcloud_normals(
                jnp.asarray(pts), neighborhood_size=16
            )
        )
        dots = np.abs(n_ours @ n_true)
        assert dots.min() > 0.98


class TestPointsToVolumesParity:
    @pytest.mark.parametrize("mode", ["trilinear", "nearest"])
    def test_add_points_features_to_volume_densities_features(self, mode):
        from pytorch3d.ops import (
            add_points_features_to_volume_densities_features as ref_fn,
        )

        from pytorch3d_tpu.ops import (
            add_points_features_to_volume_densities_features,
        )

        rng = np.random.RandomState(0)
        pts = (rng.rand(2, 50, 3).astype(np.float32) - 0.5) * 1.6
        feats = rng.rand(2, 50, 4).astype(np.float32)
        D = 8
        dens0 = np.zeros((2, 1, D, D, D), np.float32)
        feat0 = np.zeros((2, 4, D, D, D), np.float32)
        f_ref, d_ref = ref_fn(
            torch.from_numpy(pts),
            torch.from_numpy(feats),
            torch.from_numpy(dens0.copy()),
            torch.from_numpy(feat0.copy()),
            mode=mode,
            _python=True,
        )
        f, d = add_points_features_to_volume_densities_features(
            jnp.asarray(pts),
            jnp.asarray(feats),
            jnp.asarray(dens0),
            jnp.asarray(feat0),
            mode=mode,
        )
        close(d, t2n(d_ref), rtol=1e-4, atol=1e-5)
        close(f, t2n(f_ref), rtol=1e-4, atol=1e-5)


class TestStructUtilsParity:
    def test_list_to_padded_packed_roundtrip(self):
        from pytorch3d.structures import utils as ref_utils

        from pytorch3d_tpu.structures import utils as our_utils

        rng = np.random.RandomState(0)
        lists = [rng.rand(n, 3).astype(np.float32) for n in (2, 5, 3)]
        ref_pad = t2n(
            ref_utils.list_to_padded(
                [torch.from_numpy(x) for x in lists], pad_value=-7.0
            )
        )
        our_pad = np.asarray(
            our_utils.list_to_padded(
                [jnp.asarray(x) for x in lists], pad_value=-7.0
            )
        )
        close(our_pad, ref_pad)

        ref_packed, ref_nitems, ref_first, ref_to_list = (
            ref_utils.list_to_packed(
                [torch.from_numpy(x) for x in lists]
            )
        )
        our_packed = our_utils.list_to_packed(
            [jnp.asarray(x) for x in lists]
        )
        # our util may return 3 or 4 values; compare by position from front
        close(our_packed[0], t2n(ref_packed))

        back = our_utils.padded_to_list(
            jnp.asarray(our_pad), split_size=[2, 5, 3]
        )
        for a, b in zip(back, lists):
            close(a[:, :3], b)


class TestLinearWithRepeatParity:
    def test_matches_reference(self):
        from pytorch3d.common.linear_with_repeat import (
            LinearWithRepeat as RefLWR,
        )

        from pytorch3d_tpu.common import LinearWithRepeat

        torch.manual_seed(0)
        ref = RefLWR(7 + 4, 5)
        x = torch.rand(2, 6, 3, 7)
        y = torch.rand(2, 6, 4)
        out_ref = t2n(ref((x, y)))

        ours = LinearWithRepeat(5)
        w = t2n(ref.weight)  # (5, 11)
        b = t2n(ref.bias)
        params = {
            "params": {
                "kernel": jnp.asarray(w.T),
                "bias": jnp.asarray(b),
            }
        }
        out = ours.apply(
            params, (jnp.asarray(t2n(x)), jnp.asarray(t2n(y)))
        )
        close(out, out_ref, rtol=1e-4)


class TestVolumesCoordsParity:
    def test_world_local_roundtrip_matches(self):
        from pytorch3d.structures import Volumes as RefVolumes

        from pytorch3d_tpu.structures import Volumes

        rng = np.random.RandomState(0)
        dens = rng.rand(2, 1, 6, 10, 8).astype(np.float32)
        trans = rng.randn(2, 3).astype(np.float32) * 0.1
        vs = 0.7
        ref_v = RefVolumes(
            densities=torch.from_numpy(dens),
            voxel_size=vs,
            volume_translation=torch.from_numpy(trans),
        )
        our_v = Volumes.create(
            densities=jnp.asarray(dens),
            voxel_size=vs,
            volume_translation=jnp.asarray(trans),
        )
        pts = rng.randn(2, 20, 3).astype(np.float32)
        ref_local = t2n(
            ref_v.world_to_local_coords(torch.from_numpy(pts))
        )
        our_local = np.asarray(
            our_v.world_to_local_coords(jnp.asarray(pts))
        )
        close(our_local, ref_local, rtol=1e-4, atol=1e-5)
        ref_world = t2n(
            ref_v.local_to_world_coords(torch.from_numpy(ref_local))
        )
        our_world = np.asarray(
            our_v.local_to_world_coords(jnp.asarray(our_local))
        )
        close(our_world, ref_world, rtol=1e-4, atol=1e-5)

    def test_coord_grid_matches(self):
        from pytorch3d.structures import Volumes as RefVolumes

        from pytorch3d_tpu.structures import Volumes

        dens = np.zeros((1, 1, 4, 5, 6), np.float32)
        ref_v = RefVolumes(densities=torch.from_numpy(dens), voxel_size=0.5)
        our_v = Volumes.create(densities=jnp.asarray(dens), voxel_size=0.5)
        close(
            np.asarray(our_v.get_coord_grid(world_coordinates=True)),
            t2n(ref_v.get_coord_grid(world_coordinates=True)),
            rtol=1e-5,
            atol=1e-6,
        )


class TestMeshLossGradParity:
    """Gradients of the mesh losses vs reference torch autograd — includes
    the reference's no_grad Laplacian-weights semantics
    (loss/mesh_laplacian_smoothing.py:106)."""

    def _grads(self, loss_name, method=None, seed=3):
        from pytorch3d.structures import Meshes as RefMeshes
        import pytorch3d.loss as ref_loss_mod

        import pytorch3d_tpu.loss as our_loss_mod
        from pytorch3d_tpu.structures import Meshes

        from pytorch3d.utils import ico_sphere as ref_ico

        rng = np.random.RandomState(seed)
        m = ref_ico(1)
        v = (
            t2n(m.verts_packed())
            + 0.05 * rng.randn(*m.verts_packed().shape)
        ).astype(np.float32)
        f = t2n(m.faces_packed()).astype(np.int64)

        vt = torch.from_numpy(v.copy()).requires_grad_(True)
        ref = RefMeshes(verts=[vt], faces=[torch.from_numpy(f)])
        kw = {"method": method} if method else {}
        ref_out = getattr(ref_loss_mod, loss_name)(ref, **kw)
        ref_out.sum().backward()
        g_ref = t2n(vt.grad)

        ours_fn = getattr(our_loss_mod, loss_name)
        base = Meshes.create([jnp.asarray(v)], [jnp.asarray(f.astype(np.int32))])

        def loss(vj):
            return ours_fn(base.update_padded(vj[None]), **kw)

        g_ours = np.asarray(jax.grad(loss)(jnp.asarray(v)))
        return g_ours, g_ref

    @pytest.mark.parametrize("method", ["uniform", "cot", "cotcurv"])
    def test_laplacian_grads(self, method):
        g_ours, g_ref = self._grads("mesh_laplacian_smoothing", method)
        np.testing.assert_allclose(g_ours, g_ref, rtol=2e-3, atol=2e-5)

    def test_edge_loss_grads(self):
        g_ours, g_ref = self._grads("mesh_edge_loss")
        np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-6)

    def test_normal_consistency_grads(self):
        g_ours, g_ref = self._grads("mesh_normal_consistency")
        np.testing.assert_allclose(g_ours, g_ref, rtol=2e-3, atol=2e-5)


class TestFishEyeParity:
    """Direct transform/unproject parity vs the reference's pure-torch
    FishEyeCameras (renderer/fisheyecameras.py:70) across distortion
    option combos — complements the golden-render parity."""

    def _params(self, seed=0):
        rng = np.random.RandomState(seed)
        return dict(
            focal_length=np.asarray([[1.2]], np.float32),
            principal_point=np.asarray([[0.03, -0.02]], np.float32),
            radial_params=np.asarray(
                [[0.1, -0.05, 0.02, 0.0, 0.0, 0.0]], np.float32
            ),
            tangential_params=np.asarray([[0.01, -0.015]], np.float32),
            thin_prism_params=np.asarray(
                [[0.005, -0.003, 0.002, -0.001]], np.float32
            ),
        ), rng.randn(1, 40, 3).astype(np.float32) * 0.3 + np.asarray(
            [0.0, 0.0, 2.0], np.float32
        )

    @pytest.mark.parametrize(
        "use_radial,use_tangential,use_thin_prism",
        [
            (True, True, True),
            (True, False, False),
            (False, True, False),
            (False, False, True),
            (False, False, False),
        ],
    )
    def test_transform_points(
        self, use_radial, use_tangential, use_thin_prism
    ):
        from pytorch3d.renderer.fisheyecameras import (
            FishEyeCameras as RefFishEye,
        )

        from pytorch3d_tpu.renderer.fisheyecameras import FishEyeCameras

        p, pts = self._params()
        flags = dict(
            use_radial=use_radial,
            use_tangential=use_tangential,
            use_thin_prism=use_thin_prism,
        )
        ref = RefFishEye(
            **{k: torch.from_numpy(v) for k, v in p.items()}, **flags
        )
        ours = FishEyeCameras.create(
            **{k: jnp.asarray(v) for k, v in p.items()}, **flags
        )
        out_ref = t2n(ref.transform_points(torch.from_numpy(pts)))
        out = np.asarray(ours.transform_points(jnp.asarray(pts)))
        np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)

    def test_unproject_roundtrip_full_distortion(self):
        from pytorch3d.renderer.fisheyecameras import (
            FishEyeCameras as RefFishEye,
        )

        from pytorch3d_tpu.renderer.fisheyecameras import FishEyeCameras

        p, pts = self._params(seed=1)
        ref = RefFishEye(**{k: torch.from_numpy(v) for k, v in p.items()})
        ours = FishEyeCameras.create(
            **{k: jnp.asarray(v) for k, v in p.items()}
        )
        uv_ref = ref.transform_points(torch.from_numpy(pts))
        un_ref = t2n(ref.unproject_points(uv_ref))
        uv = ours.transform_points(jnp.asarray(pts))
        un = np.asarray(ours.unproject_points(uv))
        np.testing.assert_allclose(un, un_ref, rtol=1e-3, atol=1e-4)


class TestPulsarCameraConversionParity:
    def test_pulsar_from_opencv_projection(self):
        from pytorch3d.utils import (
            pulsar_from_opencv_projection as ref_fn,
        )

        from pytorch3d_tpu.utils import pulsar_from_opencv_projection

        rng = np.random.RandomState(0)
        N = 3
        # random valid rotations via QR
        Rs = []
        for _ in range(N):
            q, _ = np.linalg.qr(rng.randn(3, 3))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            Rs.append(q.astype(np.float32))
        R = np.stack(Rs)
        tvec = rng.randn(N, 3).astype(np.float32)
        K = np.zeros((N, 3, 3), np.float32)
        K[:, 0, 0] = 100.0 + rng.rand(N)
        K[:, 1, 1] = 100.0 + rng.rand(N)
        K[:, 0, 2] = 64.0 + rng.randn(N)
        K[:, 1, 2] = 48.0 + rng.randn(N)
        K[:, 2, 2] = 1.0
        image_size = np.tile(np.asarray([[96, 128]], np.int64), (N, 1))

        out_ref = t2n(
            ref_fn(
                torch.from_numpy(R),
                torch.from_numpy(tvec),
                torch.from_numpy(K),
                torch.from_numpy(image_size),
                znear=0.2,
            )
        )
        out = np.asarray(
            pulsar_from_opencv_projection(
                jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(K),
                jnp.asarray(image_size), znear=0.2,
            )
        )
        np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)

    def test_pulsar_from_cameras_projection(self):
        from pytorch3d.renderer import PerspectiveCameras as RefCams
        from pytorch3d.utils import (
            pulsar_from_cameras_projection as ref_fn,
        )

        from pytorch3d_tpu.renderer import PerspectiveCameras
        from pytorch3d_tpu.utils import pulsar_from_cameras_projection

        f = np.asarray([[100.0, 101.0]], np.float32)
        pp = np.asarray([[63.0, 49.0]], np.float32)
        image_size = np.asarray([[96, 128]], np.int64)
        ref_c = RefCams(
            focal_length=torch.from_numpy(f),
            principal_point=torch.from_numpy(pp),
            in_ndc=False,
            image_size=torch.from_numpy(image_size),
        )
        our_c = PerspectiveCameras.create(
            focal_length=jnp.asarray(f),
            principal_point=jnp.asarray(pp),
            in_ndc=False,
            image_size=jnp.asarray(image_size),
        )
        out_ref = t2n(ref_fn(ref_c, torch.from_numpy(image_size)))
        out = np.asarray(
            pulsar_from_cameras_projection(our_c, jnp.asarray(image_size))
        )
        np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)
