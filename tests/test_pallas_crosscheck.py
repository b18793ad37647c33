"""Pallas kernels vs XLA oracles in interpreter mode (CPU CI).

Mirrors the reference's python-vs-cpu-vs-cuda strategy
(tests/test_rasterize_meshes.py:72): the Pallas mesh/point rasterizer
kernels are run interpreted on CPU and compared bit-for-bit against the
XLA scan implementations used as the library's oracle path.
"""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch3d_tpu.renderer.mesh.rasterize_pallas as rmp
import pytorch3d_tpu.renderer.points.rasterize_points_pallas as rpp
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
from pytorch3d_tpu.renderer.points.rasterize_points import (
    rasterize_points_topk_xla,
    recompute_point_fragments,
)
from pytorch3d_tpu.utils import ico_sphere


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(rmp.pl, "pallas_call", patched)
    monkeypatch.setattr(rpp.pl, "pallas_call", patched)
    yield


def _sphere_faces(level=2, image_size=128):
    mesh = ico_sphere(level)
    R, T = look_at_view_transform(dist=2.7, elev=15.0, azim=20.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    rast = MeshRasterizer(cams, RasterizationSettings(image_size=image_size))
    mesh_ndc = rast.transform(mesh)
    fv = mesh_ndc.verts_padded()[0][mesh_ndc.faces_padded()[0]]
    return fv, jnp.ones((fv.shape[0],), bool)


class TestMeshKernelVsXLA:
    @pytest.mark.parametrize("blur,K", [(0.0, 1), (1e-4, 4)])
    def test_selection_matches(self, blur, K):
        fv, valid = _sphere_faces()
        idx_p = rmp.rasterize_topk_pallas(fv, valid, (128, 128), blur, K)
        idx_x = rasterize_topk_xla(fv, valid, (128, 128), blur, K)
        assert float((idx_p == idx_x).mean()) == 1.0

    def test_fragments_match(self):
        fv, valid = _sphere_faces()
        pix, zb, ba, di = rmp.rasterize_fragments_pallas(
            fv, valid, (128, 128), 1e-4, 2
        )
        zb2, ba2, di2 = interpolate_fragments(fv, pix, (128, 128))
        np.testing.assert_allclose(np.asarray(zb), np.asarray(zb2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ba), np.asarray(ba2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(di), np.asarray(di2), atol=1e-6)

    def test_gradients_match(self):
        fv, valid = _sphere_faces(level=1, image_size=64)

        def loss_pallas(f):
            pix, zb, ba, di = rmp.rasterize_fragments_pallas(
                f, valid, (64, 64), 1e-4, 2
            )
            return (
                jnp.sum(jax.nn.sigmoid(-di / 1e-4))
                + jnp.sum(ba) * 0.1
                + jnp.sum(zb) * 0.5
            )

        idx = rasterize_topk_xla(fv, valid, (64, 64), 1e-4, 2)

        def loss_xla(f):
            zb, ba, di = interpolate_fragments(f, idx, (64, 64))
            return (
                jnp.sum(jax.nn.sigmoid(-di / 1e-4))
                + jnp.sum(ba) * 0.1
                + jnp.sum(zb) * 0.5
            )

        g_p = jax.grad(loss_pallas)(fv)
        g_x = jax.grad(loss_xla)(fv)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=1e-3, atol=1e-4
        )

    def test_large_k_uses_short_tile_and_matches(self):
        # K > 32 switches to a 16-row pixel tile (_tile_for_k) to stay
        # inside Mosaic's scoped-VMEM stack limit; exercise selection,
        # fragments, and gradients on that path.
        assert rmp._tile_for_k(50) == (16, 128)
        fv, valid = _sphere_faces(level=1, image_size=64)
        K = 50
        idx_p = rmp.rasterize_topk_pallas(fv, valid, (64, 64), 1e-4, K)
        idx_x = rasterize_topk_xla(fv, valid, (64, 64), 1e-4, K)
        assert float((idx_p == idx_x).mean()) == 1.0

        def loss_pallas(f):
            pix, zb, ba, di = rmp.rasterize_fragments_pallas(
                f, valid, (64, 64), 1e-4, K
            )
            return jnp.sum(jax.nn.sigmoid(-di / 1e-4)) + jnp.sum(zb) * 0.5

        def loss_xla(f):
            zb, ba, di = interpolate_fragments(f, idx_x, (64, 64))
            return jnp.sum(jax.nn.sigmoid(-di / 1e-4)) + jnp.sum(zb) * 0.5

        g_p = jax.grad(loss_pallas)(fv)
        g_x = jax.grad(loss_xla)(fv)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=1e-3, atol=1e-4
        )


def _dense_tile_faces(n_faces, seed=0):
    """Many small faces concentrated in a small NDC region (one tile)."""
    rng = np.random.RandomState(seed)
    c = rng.uniform(-0.4, 0.4, (n_faces, 1, 2))
    tri = rng.uniform(-0.03, 0.03, (n_faces, 3, 2))
    xy = c + tri
    z = rng.uniform(1.0, 3.0, (n_faces, 1, 1)) * np.ones((1, 3, 1))
    fv = jnp.asarray(np.concatenate([xy, z], axis=-1), jnp.float32)
    return fv, jnp.ones((n_faces,), bool)


class TestStreamingAndOverflow:
    """The per-tile face lists stream through SMEM in chunks; capacity is no
    longer SMEM-bound (round-1 caps were 4096/2048).  Mirrors the CUDA
    overflow semantics test gap (rasterize_coarse.cu:192-199 warns+drops;
    we size exactly and drop nothing)."""

    def test_required_capacity_exceeds_old_smem_cap(self):
        fv, valid = _dense_tile_faces(6000)
        need = int(
            rmp.required_faces_per_tile(fv, valid, (32, 128), 0.0)
        )
        assert need > 4096  # denser than the round-1 SMEM cap

    def test_multichunk_selection_matches_xla(self):
        # capacity 6144 -> 6 chunks of 1024 streamed through SMEM
        fv, valid = _dense_tile_faces(6000)
        idx_p = rmp.rasterize_topk_pallas(
            fv, valid, (32, 128), 0.0, 3, max_faces_per_tile=6144
        )
        idx_x = rasterize_topk_xla(fv, valid, (32, 128), 0.0, 3)
        assert float((idx_p == idx_x).mean()) == 1.0

    def test_multichunk_gradients_match_xla(self):
        fv, valid = _dense_tile_faces(2500, seed=3)

        def loss_pallas(f):
            pix, zb, ba, di = rmp.rasterize_fragments_pallas(
                f, valid, (32, 128), 1e-4, 2, max_faces_per_tile=2560
            )
            return jnp.sum(jax.nn.sigmoid(-di / 1e-4)) + jnp.sum(zb)

        idx = rasterize_topk_xla(fv, valid, (32, 128), 1e-4, 2)

        def loss_xla(f):
            zb, ba, di = interpolate_fragments(f, idx, (32, 128))
            return jnp.sum(jax.nn.sigmoid(-di / 1e-4)) + jnp.sum(zb)

        g_p = np.asarray(jax.grad(loss_pallas)(fv))
        g_x = np.asarray(jax.grad(loss_xla)(fv))
        assert np.isfinite(g_p).all()
        # In a 2.5k-face dense tile a handful of pixels sit exactly on
        # segment-distance ties (closest point = shared vertex); the min()
        # subgradient there is branch-order sensitive and the 1e-4-scale
        # sigmoid amplifies the flip.  Require near-total agreement instead
        # of elementwise allclose (selection itself is bit-equal).
        close = np.isclose(g_p, g_x, rtol=1e-3, atol=1e-4)
        assert close.mean() > 0.995, f"only {close.mean():.4f} close"
        assert np.median(np.abs(g_p - g_x)) < 1e-6

    def test_bin_faces_reports_drops(self):
        fv, valid = _dense_tile_faces(1000)
        *_, n_dropped = rmp._bin_faces(
            fv, valid, (32, 128), 0.0, (32, 128), 256
        )
        assert int(n_dropped) > 0
        need = int(rmp.required_faces_per_tile(fv, valid, (32, 128), 0.0))
        *_, n_dropped2 = rmp._bin_faces(
            fv, valid, (32, 128), 0.0, (32, 128), need
        )
        assert int(n_dropped2) == 0


class TestPointKernelVsXLA:
    def test_selection_and_fragments_match(self):
        rng = np.random.RandomState(0)
        P = 500
        pts = jnp.asarray(
            np.concatenate(
                [rng.uniform(-0.8, 0.8, (P, 2)), rng.uniform(1, 3, (P, 1))],
                axis=1,
            ),
            jnp.float32,
        )
        rad = jnp.full((P,), 0.05)
        valid = jnp.ones((P,), bool)
        idx_p, zb_p, d_p = rpp.rasterize_points_fragments_pallas(
            pts, rad, valid, (64, 64), 4
        )
        idx_x = rasterize_points_topk_xla(pts, rad, valid, (64, 64), 4)
        assert float((idx_p == idx_x).mean()) == 1.0
        zb_x, d_x = recompute_point_fragments(pts, idx_x, (64, 64))
        np.testing.assert_allclose(np.asarray(zb_p), np.asarray(zb_x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-7)

    def test_gradients_match(self):
        rng = np.random.RandomState(1)
        P = 200
        pts = jnp.asarray(
            np.concatenate(
                [rng.uniform(-0.5, 0.5, (P, 2)), rng.uniform(1, 2, (P, 1))],
                axis=1,
            ),
            jnp.float32,
        )
        rad = jnp.full((P,), 0.08)
        valid = jnp.ones((P,), bool)

        def loss_pallas(p):
            idx, zb, dd = rpp.rasterize_points_fragments_pallas(
                p, rad, valid, (32, 32), 4
            )
            m = idx >= 0
            return jnp.sum(jnp.where(m, zb, 0.0)) + jnp.sum(
                jnp.where(m, dd, 0.0)
            )

        idx = rasterize_points_topk_xla(pts, rad, valid, (32, 32), 4)

        def loss_xla(p):
            zb, dd = recompute_point_fragments(p, idx, (32, 32))
            m = idx >= 0
            return jnp.sum(jnp.where(m, zb, 0.0)) + jnp.sum(
                jnp.where(m, dd, 0.0)
            )

        g_p = jax.grad(loss_pallas)(pts)
        g_x = jax.grad(loss_xla)(pts)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6
        )


class TestPointsLargeK:
    def test_k50_short_tile_matches(self):
        # points kernel shares the mesh kernel's K-aware tile rule
        assert rpp._tile_for_k(50) == (16, 128)
        rng = np.random.RandomState(2)
        P = 150
        pts = jnp.asarray(
            np.concatenate(
                [rng.uniform(-0.5, 0.5, (P, 2)), rng.uniform(1, 2, (P, 1))],
                axis=1,
            ),
            jnp.float32,
        )
        rad = jnp.full((P,), 0.25)  # big radius -> deep per-pixel lists
        valid = jnp.ones((P,), bool)
        K = 50
        idx_p, zb_p, d_p = rpp.rasterize_points_fragments_pallas(
            pts, rad, valid, (48, 48), K
        )
        idx_x = rasterize_points_topk_xla(pts, rad, valid, (48, 48), K)
        assert float((idx_p == idx_x).mean()) == 1.0

        def loss_pallas(p):
            idx, zb, dd = rpp.rasterize_points_fragments_pallas(
                p, rad, valid, (48, 48), K
            )
            m = idx >= 0
            return jnp.sum(jnp.where(m, zb, 0.0)) + jnp.sum(
                jnp.where(m, dd, 0.0)
            )

        def loss_xla(p):
            zb, dd = recompute_point_fragments(p, idx_x, (48, 48))
            m = idx_x >= 0
            return jnp.sum(jnp.where(m, zb, 0.0)) + jnp.sum(
                jnp.where(m, dd, 0.0)
            )

        g_p = jax.grad(loss_pallas)(pts)
        g_x = jax.grad(loss_xla)(pts)
        # 50 hits/pixel accumulate in different orders on the two paths;
        # fp32 ordering noise is ~3e-5 absolute here
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=1e-3, atol=5e-5
        )


class TestKnnPallasVsXLA:
    """Pallas streaming-min-K KNN (ops/knn_pallas.py) vs the XLA
    knn_points path — exact equality including tie order."""

    def test_matches_xla_small(self):
        from pytorch3d_tpu.ops import knn_points
        from pytorch3d_tpu.ops.knn_pallas import knn_points_pallas_single

        rng = np.random.RandomState(0)
        p1 = jnp.asarray(rng.randn(500, 3), jnp.float32)
        p2 = jnp.asarray(rng.randn(700, 3), jnp.float32)
        d_p, i_p = knn_points_pallas_single(p1, p2, K=4)
        ref = knn_points(p1[None], p2[None], K=4)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(ref.idx[0]))
        np.testing.assert_allclose(
            np.asarray(d_p), np.asarray(ref.dists[0]), atol=1e-5
        )

    def test_multichunk_and_lengths(self):
        from pytorch3d_tpu.ops import knn_points
        from pytorch3d_tpu.ops.knn_pallas import knn_points_pallas_single

        rng = np.random.RandomState(1)
        p1 = jnp.asarray(rng.randn(300, 3), jnp.float32)
        p2 = jnp.asarray(rng.randn(2500, 3), jnp.float32)  # > 1 chunk
        n_live = jnp.int32(1800)
        d_p, i_p = knn_points_pallas_single(p1, p2, length2=n_live, K=3)
        ref = knn_points(
            p1[None], p2[None], lengths2=n_live[None], K=3
        )
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(ref.idx[0]))
        np.testing.assert_allclose(
            np.asarray(d_p), np.asarray(ref.dists[0]), atol=1e-5
        )
        assert int(np.asarray(i_p).max()) < 1800


class TestHeuristicCapacity:
    def test_small_image_heuristic_is_full_capacity(self):
        # At 64px every face overlaps the only tile pair; the old F//4
        # guess silently dropped 75% of an ico5's faces under jit (the
        # overflow callback cannot fire on runtimes without host
        # callbacks). Below 8 tiles the heuristic must hold all faces.
        fv, valid = _sphere_faces(level=3, image_size=64)
        F = fv.shape[0]
        tile = rmp._tile_for_k(3)
        mft = rmp._heuristic_mft(F, (64, 64), tile)
        assert mft >= F
        out = rmp._bin_faces(fv, valid, (64, 64), 0.0, tile, mft)
        assert int(np.asarray(out[-1])) == 0  # n_dropped

    def test_large_image_heuristic_tile_aware(self):
        tile = rmp._tile_for_k(8)
        # many-tile regime: capacity = min(F // 4, 8 * F / n_tiles),
        # chunk-rounded; at 512^2 (64 tiles of 32x128) that is the
        # 8x-mean term: 8 * 20480 / 64 = 2560 -> rounded up to 3072
        mft = rmp._heuristic_mft(20480, (512, 512), tile)
        n_tiles = 16 * 4
        expect = rmp._round_mft(
            max(1024, min(20480 // 4, 8 * (20480 // n_tiles))), 20480
        )
        assert mft == expect
        # the F // 4 cap still binds when tiles are few relative to F
        assert rmp._heuristic_mft(20480, (256, 256), tile) <= 20480 // 4 + rmp._CHUNK


class TestAffineEdgeMode:
    """Tile-recentred affine edge functions (P3D_RASTER_AFFINE) vs the
    vertex-centered default: selection may differ only at coverage ties
    (pixels within fp rounding of an edge), fragments allclose where the
    selection agrees."""

    @pytest.fixture(autouse=True)
    def _affine(self, monkeypatch):
        jax.clear_caches()
        monkeypatch.setattr(rmp, "_AFFINE", True)
        yield
        jax.clear_caches()

    @pytest.mark.parametrize("blur,K", [(0.0, 1), (1e-4, 4)])
    def test_selection_near_identical(self, blur, K, monkeypatch):
        fv, valid = _sphere_faces()
        idx_a = np.asarray(
            rmp.rasterize_topk_pallas(fv, valid, (128, 128), blur, K)
        )
        jax.clear_caches()
        monkeypatch.setattr(rmp, "_AFFINE", False)
        idx_v = np.asarray(
            rmp.rasterize_topk_pallas(fv, valid, (128, 128), blur, K)
        )
        agree = (idx_a == idx_v).mean()
        assert agree > 0.999, f"affine selection diverged: {agree}"

    def test_fragments_allclose_on_agreement(self, monkeypatch):
        fv, valid = _sphere_faces()
        pa, za, ba, da = map(
            np.asarray,
            rmp.rasterize_fragments_pallas(fv, valid, (128, 128), 1e-4, 2),
        )
        jax.clear_caches()
        monkeypatch.setattr(rmp, "_AFFINE", False)
        pv, zv, bv, dv = map(
            np.asarray,
            rmp.rasterize_fragments_pallas(fv, valid, (128, 128), 1e-4, 2),
        )
        m = pa == pv
        assert m.mean() > 0.999
        # affine mode's documented precision envelope: cancellation is
        # bounded by the tile half-extent, costing ~4e-4 RELATIVE z/bary
        # error on faces much smaller than a tile (rasterize_pallas.py
        # _AFFINE note); dists use the exact px/py planes and are tighter.
        np.testing.assert_allclose(za[m], zv[m], atol=1e-4)
        np.testing.assert_allclose(ba[m], bv[m], atol=5e-4)
        np.testing.assert_allclose(da[m], dv[m], atol=1e-6)
