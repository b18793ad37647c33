"""MeshRasterizerOpenGL (hard-rasterization fast path) tests.

Mirrors the reference's tests/test_rasterizer.py TestMeshRasterizerOpenGL
scenarios (setting checks, K=1 hard raster semantics) with the TPU twist:
the GL backend is replaced by a dedicated z-min Pallas kernel
(`rasterize_hard_pallas`), cross-checked here in interpreter mode against
the XLA selection oracle.
"""

import os
import warnings

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch3d_tpu.renderer.mesh.rasterize_pallas as rmp
from pytorch3d_tpu.renderer import (
    FoVOrthographicCameras,
    FoVPerspectiveCameras,
    PerspectiveCameras,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
    interpolate_fragments,
    rasterize_topk_xla,
)
from pytorch3d_tpu.renderer.mesh.rasterizer import (
    MeshRasterizer,
    MeshRasterizerOpenGL,
)
from pytorch3d_tpu.utils import ico_sphere


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(rmp.pl, "pallas_call", patched)
    yield


def _cams(ortho=False):
    R, T = look_at_view_transform(dist=2.7, elev=15.0, azim=20.0)
    cls = FoVOrthographicCameras if ortho else FoVPerspectiveCameras
    return cls.create(R=R, T=T)


class TestHardKernelVsOracle:
    @pytest.mark.parametrize("image_size", [(64, 64), (96, 160)])
    def test_matches_xla_selection(self, interpret_pallas, image_size):
        mesh = ico_sphere(2)
        rast = MeshRasterizer(
            _cams(), RasterizationSettings(image_size=image_size)
        )
        mesh_ndc = rast.transform(mesh)
        fv = mesh_ndc.verts_padded()[0][mesh_ndc.faces_padded()[0]]
        valid = jnp.ones((fv.shape[0],), bool)

        pix, zb, ba = rmp.rasterize_hard_pallas(fv, valid, image_size)
        pix_o = rasterize_topk_xla(fv, valid, image_size, 0.0, 1)
        zb_o, ba_o, _ = interpolate_fragments(
            fv, pix_o, image_size, perspective_correct=True
        )
        np.testing.assert_array_equal(np.asarray(pix), np.asarray(pix_o))
        hit = np.asarray(pix) >= 0
        np.testing.assert_allclose(
            np.asarray(zb)[hit], np.asarray(zb_o)[hit], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ba)[hit], np.asarray(ba_o)[hit], atol=1e-4
        )
        # empty pixels use the reference fill values
        assert (np.asarray(zb)[~hit] == -1.0).all()
        assert (np.asarray(ba)[~hit[..., None].repeat(3, -1)] == -1.0).all()


class TestMeshRasterizerOpenGL:
    def test_matches_standard_rasterizer(self):
        mesh = ico_sphere(2)
        cams = _cams()
        rs = RasterizationSettings(
            image_size=64, faces_per_pixel=1, perspective_correct=True
        )
        frags = MeshRasterizerOpenGL(cams, rs)(mesh)
        ref = MeshRasterizer(cams, rs)(mesh)
        np.testing.assert_array_equal(
            np.asarray(frags.pix_to_face), np.asarray(ref.pix_to_face)
        )
        hit = np.asarray(frags.pix_to_face) >= 0
        np.testing.assert_allclose(
            np.asarray(frags.zbuf)[hit], np.asarray(ref.zbuf)[hit], atol=1e-5
        )
        assert frags.dists is None

    def test_ortho_cameras_supported(self):
        frags = MeshRasterizerOpenGL(
            _cams(ortho=True), RasterizationSettings(image_size=64)
        )(ico_sphere(1))
        assert (np.asarray(frags.pix_to_face) >= 0).any()

    def test_batched_packed_face_ids(self):
        from pytorch3d_tpu.structures import join_meshes_as_batch

        mesh = join_meshes_as_batch([ico_sphere(1), ico_sphere(2)])
        R, T = look_at_view_transform(
            dist=jnp.array([2.7, 2.7]),
            elev=jnp.array([10.0, 30.0]),
            azim=jnp.array([0.0, 40.0]),
        )
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        frags = MeshRasterizerOpenGL(
            cams, RasterizationSettings(image_size=48)
        )(mesh)
        F = mesh.max_faces
        pix1 = np.asarray(frags.pix_to_face[1])
        assert (pix1[pix1 >= 0] >= F).all()  # mesh 1 ids offset into packed

    def test_nondifferentiable(self):
        mesh = ico_sphere(1)
        cams = _cams()
        rast = MeshRasterizerOpenGL(
            cams, RasterizationSettings(image_size=32)
        )

        def loss(offset):
            frags = rast(mesh.offset_verts(offset))
            return jnp.where(
                frags.pix_to_face >= 0, frags.zbuf, 0.0
            ).sum()

        g = jax.grad(loss)(jnp.zeros_like(mesh.verts_padded()[0]))
        assert float(jnp.abs(g).max()) == 0.0  # GL analog: stop_gradient

    # ----- reference _check_cameras / _check_raster_settings parity ----- #

    def test_rejects_missing_cameras(self):
        rast = MeshRasterizerOpenGL(
            raster_settings=RasterizationSettings(image_size=32)
        )
        with pytest.raises(ValueError, match="Cameras must be specified"):
            rast(ico_sphere(0))

    def test_rejects_non_fov_cameras(self):
        cams = PerspectiveCameras.create(
            focal_length=jnp.array([[2.0]]),
        )
        rast = MeshRasterizerOpenGL(
            cams, RasterizationSettings(image_size=32)
        )
        with pytest.raises(ValueError, match="only works with FoV"):
            rast(ico_sphere(0))

    def test_rejects_z_clip_and_affine(self):
        with pytest.raises(NotImplementedError, match="z-clipping"):
            MeshRasterizerOpenGL(
                _cams(),
                RasterizationSettings(image_size=32, z_clip_value=0.1),
            )(ico_sphere(0))
        with pytest.raises(ValueError, match="perspective-correct"):
            MeshRasterizerOpenGL(
                _cams(),
                RasterizationSettings(
                    image_size=32, perspective_correct=False
                ),
            )(ico_sphere(0))

    def test_warns_on_unsupported_settings(self):
        for rs in [
            RasterizationSettings(image_size=32, faces_per_pixel=4),
            RasterizationSettings(image_size=32, cull_backfaces=True),
            RasterizationSettings(image_size=32, cull_to_frustum=True),
        ]:
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                MeshRasterizerOpenGL(_cams(), rs)(ico_sphere(0))
            assert len(w) >= 1


DATA = "/root/reference/tests/data"


@pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference goldens not available"
)
class TestReferenceSilhouetteGoldens:
    """Binary pix_to_face masks vs the reference's shipped
    test_rasterized_sphere[_zoom]_MeshRasterizer{,OpenGL}.png goldens
    (reference tests/test_rasterizer.py:57-140)."""

    def _mask(self, rast_cls, dist):
        R, T = look_at_view_transform(dist, 0.0, 0.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        rs = RasterizationSettings(
            image_size=512, blur_radius=0.0, faces_per_pixel=1
        )
        frags = rast_cls(cams, rs)(ico_sphere(5))
        return np.asarray(frags.pix_to_face[0, ..., 0] >= 0)

    @pytest.mark.parametrize(
        "rast_cls,name",
        [
            (MeshRasterizer, "MeshRasterizer"),
            (MeshRasterizerOpenGL, "MeshRasterizerOpenGL"),
        ],
    )
    @pytest.mark.parametrize("zoom", [False, True])
    def test_sphere_silhouette(self, rast_cls, name, zoom):
        from PIL import Image

        fname = (
            f"test_rasterized_sphere_zoom_{name}.png"
            if zoom
            else f"test_rasterized_sphere_{name}.png"
        )
        ref = (
            np.asarray(
                Image.open(os.path.join(DATA, fname)).convert("L"),
                np.float32,
            )
            / 255.0
        ) > 0.5
        got = self._mask(rast_cls, 20.0 if zoom else 2.7)
        mismatch = (got != ref).mean()
        assert mismatch < 2e-4, f"{fname}: mismatch frac {mismatch}"
