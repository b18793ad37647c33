"""Rasterizer parity vs the REFERENCE's own naive python rasterizers
(rasterize_meshes_python :404, rasterize_points_python :245) on identical
NDC geometry — pix_to_face/zbuf/bary/dists compared directly.

This is the reference's core correctness strategy
(tests/test_rasterize_meshes.py:72 test_python_vs_cpu_vs_cuda) pointed at
our TPU implementation.
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


def _shared_mesh(level=1):
    """Reference Meshes + our face-verts tensor in identical NDC space."""
    from pytorch3d.renderer import (
        FoVPerspectiveCameras as RefCam,
        look_at_view_transform as ref_lavt,
    )
    from pytorch3d.utils import ico_sphere as ref_ico

    mesh = ref_ico(level)
    R, T = ref_lavt(dist=2.7, elev=10.0, azim=30.0)
    cam = RefCam(R=R, T=T)
    verts_world = mesh.verts_padded()
    w2v = cam.get_world_to_view_transform()
    verts_view = w2v.transform_points(verts_world)
    proj = cam.get_projection_transform().compose(
        cam.get_ndc_camera_transform()
    )
    verts_ndc = proj.transform_points(verts_view)
    verts_ndc[..., 2] = verts_view[..., 2]
    mesh_ndc = mesh.update_padded(verts_ndc)
    fv = t2n(mesh_ndc.verts_packed()[mesh_ndc.faces_packed()])
    return mesh_ndc, jnp.asarray(fv)


class TestMeshRasterParity:
    def _compare(self, blur, K, perspective_correct=False):
        from pytorch3d.renderer.mesh.rasterize_meshes import (
            rasterize_meshes_python,
        )

        from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
            interpolate_fragments,
            rasterize_topk_xla,
        )

        mesh_ndc, fv = _shared_mesh()
        S = 32
        pix_r, zbuf_r, bary_r, dists_r = rasterize_meshes_python(
            mesh_ndc, S, blur, K,
            perspective_correct=perspective_correct,
            cull_to_frustum=False,
        )
        valid = jnp.ones((fv.shape[0],), bool)
        pix_o = rasterize_topk_xla(
            fv, valid, (S, S), blur, K,
            perspective_correct=perspective_correct,
        )
        np.testing.assert_array_equal(np.asarray(pix_o), t2n(pix_r)[0])
        zbuf_o, bary_o, dists_o = interpolate_fragments(
            fv, pix_o, (S, S), perspective_correct,
        )
        sel = np.asarray(pix_o) >= 0
        np.testing.assert_allclose(
            np.asarray(zbuf_o)[sel], t2n(zbuf_r)[0][sel], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(bary_o)[sel], t2n(bary_r)[0][sel], rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(dists_o)[sel], t2n(dists_r)[0][sel], rtol=1e-3, atol=1e-5
        )

    def test_hard_raster(self):
        self._compare(0.0, 1)

    def test_soft_raster(self):
        self._compare(1e-3, 4)

    def test_perspective_correct(self):
        self._compare(0.0, 2, perspective_correct=True)


class TestPointRasterParity:
    def test_points(self):
        from pytorch3d.renderer.points.rasterize_points import (
            rasterize_points_python,
        )
        from pytorch3d.structures import Pointclouds as RefPC

        from pytorch3d_tpu.renderer.points.rasterize_points import (
            rasterize_points_topk_xla,
            recompute_point_fragments,
        )

        rng = np.random.RandomState(0)
        P, S, K, radius = 60, 24, 3, 0.12
        pts = np.concatenate(
            [rng.uniform(-0.8, 0.8, (P, 2)), rng.uniform(1, 3, (P, 1))],
            axis=1,
        ).astype(np.float32)

        ref_pc = RefPC(points=[torch.tensor(pts)])
        idx_r, zbuf_r, dists_r = rasterize_points_python(
            ref_pc, S, radius, K
        )
        idx_o = rasterize_points_topk_xla(
            jnp.asarray(pts), jnp.full((P,), radius), jnp.ones((P,), bool),
            (S, S), K,
        )
        np.testing.assert_array_equal(np.asarray(idx_o), t2n(idx_r)[0])
        zbuf_o, dists_o = recompute_point_fragments(
            jnp.asarray(pts), idx_o, (S, S)
        )
        sel = np.asarray(idx_o) >= 0
        np.testing.assert_allclose(
            np.asarray(zbuf_o)[sel], t2n(zbuf_r)[0][sel], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dists_o)[sel], t2n(dists_r)[0][sel], atol=1e-5
        )


class TestGradientParity:
    def test_raster_gradients_match_reference_autograd(self):
        """BASELINE north star: soft-raster vertex gradients allclose to the
        reference (torch autograd through rasterize_meshes_python)."""
        import jax

        from pytorch3d.renderer.mesh.rasterize_meshes import (
            rasterize_meshes_python,
        )
        from pytorch3d.renderer import (
            FoVPerspectiveCameras as RefCam,
            look_at_view_transform as ref_lavt,
        )
        from pytorch3d.utils import ico_sphere as ref_ico

        from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
            interpolate_fragments,
            rasterize_topk_xla,
        )

        mesh = ref_ico(1)
        R, T = ref_lavt(dist=2.7, elev=10.0, azim=30.0)
        cam = RefCam(R=R, T=T)
        w2v = cam.get_world_to_view_transform()
        proj = cam.get_projection_transform().compose(
            cam.get_ndc_camera_transform()
        )
        vv = w2v.transform_points(mesh.verts_padded())
        vndc = proj.transform_points(vv)
        vndc_np = vndc.detach().numpy().copy()
        vndc_np[..., 2] = vv.detach().numpy()[..., 2]

        S, blur, K = 16, 1e-3, 4
        v_ref = torch.tensor(vndc_np, requires_grad=True)
        pix, zbuf, bary, dists = rasterize_meshes_python(
            mesh.update_padded(v_ref), S, blur, K, cull_to_frustum=False
        )
        mask = (pix >= 0).float()
        loss = (
            (torch.sigmoid(-dists / 1e-3) * mask).sum()
            + (zbuf * mask).sum() * 0.1
            + (bary * mask[..., None]).sum() * 0.01
        )
        loss.backward()
        g_ref = v_ref.grad.numpy()

        faces = jnp.asarray(t2n(mesh.faces_packed()).astype(np.int32))
        valid = jnp.ones((faces.shape[0],), bool)

        def loss_ours(v):
            fv = v.reshape(-1, 3)[faces]
            idx = rasterize_topk_xla(
                jax.lax.stop_gradient(fv), valid, (S, S), blur, K
            )
            zb, ba, di = interpolate_fragments(fv, idx, (S, S))
            m = idx >= 0
            return (
                jnp.sum(jnp.where(m, jax.nn.sigmoid(-di / 1e-3), 0.0))
                + jnp.sum(jnp.where(m, zb, 0.0)) * 0.1
                + jnp.sum(jnp.where(m[..., None], ba, 0.0)) * 0.01
            )

        g_ours = np.asarray(jax.grad(loss_ours)(jnp.asarray(vndc_np)))
        np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-4)
