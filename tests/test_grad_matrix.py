"""Gradients-across-implementations matrix (VERDICT r2 #10).

The reference's `_compare_impls` (reference tests/test_rasterize_meshes.py:543)
checks that VALUE and GRADIENT agree between its python/CPU/CUDA/binned
rasterizer implementations over a config product.  The TPU analog compares
the compiled-path Pallas kernels (run in interpret mode on CPU CI) against
the XLA-oracle implementation over the full
blur x perspective_correct x clip_bary x cull x K product, plus
heterogeneous padded batches — 52+ cells, each asserting selection equality
and fragment-gradient allclose.

Finite-difference gradient checks for splatter blending and point
compositing (the reference checks these via torch.autograd.gradcheck) live
at the bottom.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import pytorch3d_tpu.renderer.mesh.rasterize_pallas as rmp
from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    MeshRasterizer,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
    interpolate_fragments,
    rasterize_topk_xla,
)
from pytorch3d_tpu.utils import ico_sphere


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(rmp.pl, "pallas_call", patched)
    yield


_S = 64


def _faces(level=1, azim=25.0):
    mesh = ico_sphere(level)
    # break the icosphere's symmetry: with large blur + K=4, exactly-tied
    # z keys otherwise make the top-K tie-break order (not correctness)
    # differ between implementations
    rng = np.random.RandomState(3)
    jitter = jnp.asarray(
        1e-3 * rng.randn(*mesh.verts_padded().shape), jnp.float32
    )
    mesh = mesh.update_padded(mesh.verts_padded() + jitter)
    R, T = look_at_view_transform(dist=2.7, elev=12.0, azim=azim)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    rast = MeshRasterizer(cams, RasterizationSettings(image_size=_S))
    tm = rast.transform(mesh)
    fv = tm.verts_padded()[0][tm.faces_padded()[0]]
    valid = tm.faces_padded()[0, :, 0] >= 0
    return fv, valid


def _loss_terms(z, b, d):
    # weighted mix so every differentiable output contributes
    sil = jax.nn.sigmoid(-d / 2e-4)
    return (
        jnp.sum(sil) * 1e-3
        + jnp.sum(jnp.where(z > 0, z, 0.0)) * 1e-4
        + jnp.sum(b * b) * 1e-4
    )


def _grad_xla(fv, valid, K, blur, persp, clip, cull):
    def loss(f):
        idx = rasterize_topk_xla(
            jax.lax.stop_gradient(f), valid, (_S, _S), blur, K,
            perspective_correct=persp, clip_barycentric_coords=clip,
            cull_backfaces=cull,
        )
        z, b, d = interpolate_fragments(
            f, idx, (_S, _S), perspective_correct=persp,
            clip_barycentric_coords=clip,
        )
        return _loss_terms(z, b, d)

    return jax.value_and_grad(loss)(fv)


def _grad_pallas(fv, valid, K, blur, persp, clip, cull):
    def loss(f):
        _, z, b, d = rmp.rasterize_fragments_pallas(
            f, valid, (_S, _S), blur, K,
            perspective_correct=persp, clip_barycentric_coords=clip,
            cull_backfaces=cull,
        )
        return _loss_terms(z, b, d)

    return jax.value_and_grad(loss)(fv)


_GRID = list(
    itertools.product(
        (1, 4),                 # faces_per_pixel
        (0.0, 1e-4, 4e-3),      # blur_radius
        (False, True),          # perspective_correct
        (False, True),          # clip_barycentric_coords
        (False, True),          # cull_backfaces
    )
)  # 48 cells


class TestGradMatrixPallasVsXla:
    """Pallas (interpret) vs XLA oracle: value + gradient, 48-cell grid."""

    @pytest.mark.parametrize("K,blur,persp,clip,cull", _GRID)
    def test_cell(self, K, blur, persp, clip, cull):
        fv, valid = _faces()
        lx, gx = _grad_xla(fv, valid, K, blur, persp, clip, cull)
        lp, gp = _grad_pallas(fv, valid, K, blur, persp, clip, cull)
        # Selection may differ at pixels where two faces' z keys agree to
        # within fp rounding (documented tie class, PARITY_TPU.json); such
        # a pixel legitimately attributes its cotangent to a different
        # face.  Require the tie fraction to be tiny and widen the grad
        # tolerance only when ties exist.
        idx_x = rasterize_topk_xla(
            fv, valid, (_S, _S), blur, K, perspective_correct=persp,
            clip_barycentric_coords=clip, cull_backfaces=cull,
        )
        idx_p = rmp.rasterize_fragments_pallas(
            fv, valid, (_S, _S), blur, K, perspective_correct=persp,
            clip_barycentric_coords=clip, cull_backfaces=cull,
        )[0]
        idx_x = np.asarray(idx_x)
        idx_p = np.asarray(idx_p)
        tie_px = idx_x != idx_p
        neq = float(tie_px.mean())
        assert neq < 0.005, f"selection mismatch fraction {neq}"
        np.testing.assert_allclose(
            float(lx), float(lp), rtol=1e-5 if neq == 0.0 else 1e-4
        )
        # A tied pixel attributes its (large, sigmoid-slope-scaled)
        # cotangent to a different but equally-valid face, so faces
        # touched by tie pixels are excluded from the elementwise check;
        # everything else must agree tightly.
        gx = np.asarray(gx)
        gp = np.asarray(gp)
        mask = np.ones(gx.shape[0], bool)
        if tie_px.any():
            tied_ids = np.unique(
                np.concatenate([idx_x[tie_px], idx_p[tie_px]])
            )
            mask[tied_ids[tied_ids >= 0]] = False
        # an 80-face ico1 with ~30 tie pixels x K ids can exclude ~25%
        assert mask.mean() > 0.7, "too many tie-excluded faces"
        np.testing.assert_allclose(
            gx[mask], gp[mask], rtol=1e-4, atol=1e-6,
            err_msg=(
                f"K={K} blur={blur} persp={persp} clip={clip} cull={cull}"
                f" tie_frac={neq}"
            ),
        )
        assert float(np.abs(gx).max()) > 0


class TestGradMatrixHeterogeneous:
    """Heterogeneous padded batch (ico1 + ico2 padded to common F):
    the valid-mask path must not leak gradient into padding."""

    @pytest.mark.parametrize(
        "K,blur", [(1, 0.0), (1, 1e-4), (4, 0.0), (4, 1e-4)]
    )
    def test_hetero_cell(self, K, blur):
        from pytorch3d_tpu.structures import join_meshes_as_batch

        m1 = ico_sphere(1)
        m2 = ico_sphere(2)
        batch = join_meshes_as_batch([m1, m2])
        R, T = look_at_view_transform(
            dist=2.7, elev=12.0, azim=jnp.asarray([25.0, -40.0])
        )
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        rast = MeshRasterizer(cams, RasterizationSettings(image_size=_S))
        tm = rast.transform(batch)
        faces = tm.faces_padded()
        for i in range(2):
            fv = tm.verts_padded()[i][jnp.maximum(faces[i], 0)]
            valid = faces[i][:, 0] >= 0
            lx, gx = _grad_xla(fv, valid, K, blur, True, False, False)
            lp, gp = _grad_pallas(fv, valid, K, blur, True, False, False)
            np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(gx), np.asarray(gp), rtol=1e-4, atol=1e-6
            )
            # padding rows must carry zero gradient
            pad_g = np.asarray(gp)[~np.asarray(valid)]
            if pad_g.size:
                assert np.abs(pad_g).max() == 0.0


def _fd_grad(f, x, eps=2e-3):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        g[i] = (f(jnp.asarray(xp, jnp.float32))
                - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


class TestFiniteDifference:
    """FD gradient checks the reference runs via torch.autograd.gradcheck
    (splatter blending colors; point compositing features)."""

    def test_splatter_blend_colors_fd(self):
        from types import SimpleNamespace

        from pytorch3d_tpu.renderer.blending import BlendParams
        from pytorch3d_tpu.renderer.splatter_blend import SplatterBlender

        rng = np.random.RandomState(0)
        N, H, W, K = 1, 4, 4, 2
        colors0 = rng.rand(N, H, W, K, 3).astype(np.float32)
        grid = np.stack(
            np.meshgrid(np.arange(W), np.arange(H)), axis=-1
        ).astype(np.float32)  # (H, W, 2) x,y screen coords
        pixel_coords = jnp.asarray(
            grid[None, :, :, None, :].repeat(K, axis=3)
            + 0.3 * rng.rand(N, H, W, K, 2).astype(np.float32)
        )
        zbuf = jnp.asarray(1.0 + rng.rand(N, H, W, K).astype(np.float32))
        fragments = SimpleNamespace(
            pix_to_face=jnp.zeros((N, H, W, K), jnp.int32), zbuf=zbuf
        )
        blender = SplatterBlender((N, H, W, K))
        bp = BlendParams(sigma=0.5)

        def render(c):
            rgba = jnp.concatenate(
                [c, jnp.full(c.shape[:-1] + (1,), 0.8, c.dtype)], -1
            )
            return blender(rgba, pixel_coords, fragments, bp)

        def f(c):
            return float(jnp.sum(render(c)[..., :3] ** 2))

        def fj(c):
            return jnp.sum(render(c)[..., :3] ** 2)

        ad = np.asarray(jax.grad(fj)(jnp.asarray(colors0)))
        fd = _fd_grad(f, colors0)
        denom = np.maximum(np.abs(fd), 0.05)
        assert np.isfinite(ad).all()
        assert (np.abs(ad - fd) / denom).max() < 0.08, (
            f"splatter FD mismatch {np.abs(ad - fd).max()}"
        )

    def test_alpha_composite_fd(self):
        from pytorch3d_tpu.renderer.points.compositing import alpha_composite

        rng = np.random.RandomState(1)
        C, P = 3, 5
        H = W = 3
        K = 2
        feats0 = rng.rand(C, P).astype(np.float32)
        alphas = jnp.asarray(
            0.3 + 0.5 * rng.rand(1, K, H, W).astype(np.float32)
        )
        idx = jnp.asarray(
            rng.randint(-1, P, size=(1, K, H, W)), jnp.int32
        )

        def f(ft):
            out = alpha_composite(idx, alphas, ft)
            return float(jnp.sum(out * out))

        def fj(ft):
            out = alpha_composite(idx, alphas, ft)
            return jnp.sum(out * out)

        ad = np.asarray(jax.grad(fj)(jnp.asarray(feats0)))
        fd = _fd_grad(f, feats0)
        denom = np.maximum(np.abs(fd), 0.05)
        assert np.isfinite(ad).all()
        assert (np.abs(ad - fd) / denom).max() < 0.08

    def test_norm_weighted_sum_fd(self):
        from pytorch3d_tpu.renderer.points.compositing import (
            norm_weighted_sum,
        )

        rng = np.random.RandomState(2)
        C, P = 2, 4
        H = W = 3
        K = 2
        feats0 = rng.rand(C, P).astype(np.float32)
        weights = jnp.asarray(
            0.2 + 0.6 * rng.rand(1, K, H, W).astype(np.float32)
        )
        idx = jnp.asarray(
            rng.randint(-1, P, size=(1, K, H, W)), jnp.int32
        )

        def f(ft):
            out = norm_weighted_sum(idx, weights, ft)
            return float(jnp.sum(out * out))

        def fj(ft):
            out = norm_weighted_sum(idx, weights, ft)
            return jnp.sum(out * out)

        ad = np.asarray(jax.grad(fj)(jnp.asarray(feats0)))
        fd = _fd_grad(f, feats0)
        denom = np.maximum(np.abs(fd), 0.05)
        assert np.isfinite(ad).all()
        assert (np.abs(ad - fd) / denom).max() < 0.08
