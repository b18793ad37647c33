"""Tests for core ops: knn, ball_query, FPS, packed/padded, sampling,
alignment, normals, graph conv, subdivision (cross-checked against naive
numpy oracles, mirroring the reference's python-vs-kernel strategy,
reference tests/test_knn.py etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.ops import (
    ball_query,
    corresponding_points_alignment,
    estimate_pointcloud_normals,
    gather_scatter,
    GraphConv,
    iterative_closest_point,
    knn_gather,
    knn_points,
    masked_gather,
    mesh_face_areas_normals,
    packed_to_padded,
    padded_to_packed,
    sample_farthest_points,
    sample_points_from_meshes,
    SubdivideMeshes,
    wmean,
)
from pytorch3d_tpu.structures import Meshes, Pointclouds
from pytorch3d_tpu.utils import ico_sphere


def _np_knn(p1, p2, lengths1, lengths2, K):
    N, P1, D = p1.shape
    dists = np.zeros((N, P1, K))
    idx = np.zeros((N, P1, K), dtype=np.int64)
    for n in range(N):
        for i in range(lengths1[n]):
            d = np.sum((p2[n, : lengths2[n]] - p1[n, i]) ** 2, axis=-1)
            order = np.argsort(d, kind="stable")[:K]
            dists[n, i, : len(order)] = d[order]
            idx[n, i, : len(order)] = order
    return dists, idx


class TestKNN:
    def test_vs_naive(self):
        rng = np.random.RandomState(0)
        N, P1, P2, D, K = 3, 17, 23, 3, 4
        p1 = rng.randn(N, P1, D).astype(np.float32)
        p2 = rng.randn(N, P2, D).astype(np.float32)
        lengths1 = np.array([17, 10, 5])
        lengths2 = np.array([23, 8, 4])
        out = knn_points(
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(lengths1), jnp.asarray(lengths2), K=K, return_nn=True,
        )
        ref_d, ref_i = _np_knn(p1, p2, lengths1, lengths2, K)
        for n in range(N):
            kk = min(K, lengths2[n])
            np.testing.assert_allclose(
                np.asarray(out.dists)[n, : lengths1[n], :kk],
                ref_d[n, : lengths1[n], :kk],
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(out.idx)[n, : lengths1[n], :kk],
                ref_i[n, : lengths1[n], :kk],
            )
        # gathered nn coords match idx
        got = np.asarray(out.knn)[0, 0, 0]
        np.testing.assert_allclose(got, p2[0, ref_i[0, 0, 0]], rtol=1e-6)

    def test_grad_flows(self):
        p1 = jnp.asarray(np.random.RandomState(1).randn(2, 8, 3), jnp.float32)
        p2 = jnp.asarray(np.random.RandomState(2).randn(2, 9, 3), jnp.float32)

        def loss(a, b):
            out = knn_points(a, b, K=2)
            return jnp.sum(out.dists)

        g1, g2 = jax.grad(loss, argnums=(0, 1))(p1, p2)
        assert np.isfinite(np.asarray(g1)).all()
        assert np.abs(np.asarray(g2)).sum() > 0


class TestBallQuery:
    def test_first_k_semantics(self):
        rng = np.random.RandomState(3)
        N, P1, P2, K = 2, 9, 31, 5
        radius = 0.6
        p1 = rng.rand(N, P1, 3).astype(np.float32)
        p2 = rng.rand(N, P2, 3).astype(np.float32)
        out = ball_query(jnp.asarray(p1), jnp.asarray(p2), K=K, radius=radius)
        for n in range(N):
            for i in range(P1):
                d = np.sum((p2[n] - p1[n, i]) ** 2, axis=-1)
                inside = np.where(d < radius**2)[0][:K]
                got = np.asarray(out.idx)[n, i]
                got = got[got >= 0]
                np.testing.assert_array_equal(got, inside)


class TestFPS:
    def test_first_point_and_spread(self):
        rng = np.random.RandomState(4)
        pts = rng.rand(2, 64, 3).astype(np.float32)
        sel, idx = sample_farthest_points(jnp.asarray(pts), K=8)
        assert idx.shape == (2, 8)
        # starts at index 0, no repeats
        assert np.asarray(idx)[:, 0].tolist() == [0, 0]
        for n in range(2):
            assert len(set(np.asarray(idx)[n].tolist())) == 8

    def test_naive_match(self):
        # greedy FPS: next point maximizes min dist to selected
        rng = np.random.RandomState(5)
        pts = rng.rand(1, 20, 3).astype(np.float32)
        _, idx = sample_farthest_points(jnp.asarray(pts), K=5)
        sel = [0]
        for _ in range(4):
            d = np.min(
                np.sum((pts[0][:, None] - pts[0][sel][None]) ** 2, -1), axis=1
            )
            d[sel] = -np.inf
            sel.append(int(np.argmax(d)))
        np.testing.assert_array_equal(np.asarray(idx)[0], sel)

    def test_lengths(self):
        pts = jnp.asarray(np.random.RandomState(6).rand(2, 30, 3), jnp.float32)
        lengths = jnp.asarray([30, 10])
        sel, idx = sample_farthest_points(pts, lengths=lengths, K=15)
        assert (np.asarray(idx)[1, 10:] == -1).all()
        assert (np.asarray(idx)[1, :10] < 10).all()


class TestPackedPadded:
    def test_round_trip(self):
        first_idxs = jnp.asarray([0, 4, 9], jnp.int32)
        vals = jnp.arange(12.0)[:, None] * jnp.ones((1, 2))
        padded = packed_to_padded(vals, first_idxs, 5)
        assert padded.shape == (3, 5, 2)
        np.testing.assert_allclose(np.asarray(padded)[0, :4, 0], [0, 1, 2, 3])
        assert (np.asarray(padded)[0, 4] == 0).all()
        back = padded_to_packed(padded, first_idxs, 12)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vals))

    def test_1d(self):
        first_idxs = jnp.asarray([0, 3], jnp.int32)
        vals = jnp.arange(5.0)
        padded = packed_to_padded(vals, first_idxs, 3)
        np.testing.assert_allclose(np.asarray(padded), [[0, 1, 2], [3, 4, 0]])


class TestFaceAreasNormals:
    def test_simple(self):
        verts = jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2], [-1, -1, -1]], jnp.int32)
        areas, normals = mesh_face_areas_normals(verts, faces)
        np.testing.assert_allclose(np.asarray(areas), [0.5, 0.0], atol=1e-7)
        np.testing.assert_allclose(np.asarray(normals)[0], [0, 0, 1], atol=1e-7)


class TestSamplePoints:
    def test_on_sphere(self):
        mesh = ico_sphere(2)
        samples, normals = sample_points_from_meshes(
            mesh, num_samples=500, return_normals=True, key=jax.random.PRNGKey(7)
        )
        r = np.linalg.norm(np.asarray(samples)[0], axis=-1)
        assert (np.abs(r - 1.0) < 0.1).all()  # near unit sphere
        nn = np.linalg.norm(np.asarray(normals)[0], axis=-1)
        np.testing.assert_allclose(nn, 1.0, atol=1e-4)


class TestAlignment:
    def test_umeyama_recovers_rigid(self):
        rng = np.random.RandomState(8)
        X = rng.randn(2, 30, 3).astype(np.float32)
        # random rotation via QR
        q, _ = np.linalg.qr(rng.randn(2, 3, 3))
        det = np.linalg.det(q)
        q[:, :, 0] *= det[:, None]  # proper rotations
        t = rng.randn(2, 3).astype(np.float32)
        Y = np.einsum("npi,nij->npj", X, q) + t[:, None]
        sim = corresponding_points_alignment(jnp.asarray(X), jnp.asarray(Y))
        np.testing.assert_allclose(np.asarray(sim.R), q, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sim.T), t, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sim.s), 1.0, atol=1e-5)

    def test_umeyama_scale(self):
        rng = np.random.RandomState(9)
        X = rng.randn(1, 20, 3).astype(np.float32)
        Y = 2.5 * X
        sim = corresponding_points_alignment(
            jnp.asarray(X), jnp.asarray(Y), estimate_scale=True
        )
        np.testing.assert_allclose(np.asarray(sim.s), [2.5], atol=1e-4)

    def test_icp_converges(self):
        rng = np.random.RandomState(10)
        X = rng.randn(1, 50, 3).astype(np.float32)
        angle = 0.3
        R = np.asarray(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1],
            ],
            np.float32,
        )[None]
        Y = np.einsum("npi,nij->npj", X, R) + 0.1
        sol = iterative_closest_point(jnp.asarray(X), jnp.asarray(Y))
        assert float(sol.rmse[0]) < 1e-3
        assert sol.converged

    def test_icp_under_jit(self):
        """ICP must be jit-compatible: the traced path runs a fixed-length
        masked lax.scan with a traced `converged` flag (the eager path
        keeps host-side early exit)."""
        rng = np.random.RandomState(10)
        X = rng.randn(2, 40, 3).astype(np.float32)
        angle = 0.25
        R = np.asarray(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1],
            ],
            np.float32,
        )[None]
        Y = np.einsum("npi,nij->npj", X, R) + 0.1
        f = jax.jit(
            lambda a, b: iterative_closest_point(a, b, max_iterations=30)
        )
        sol = f(jnp.asarray(X), jnp.asarray(Y))
        assert bool(sol.converged)
        assert float(np.asarray(sol.rmse).max()) < 1e-3
        # history is stacked to max_iterations with frozen tail
        assert len(sol.t_history) == 30


class TestPointsNormals:
    def test_plane_normals(self):
        rng = np.random.RandomState(11)
        pts = rng.rand(1, 100, 3).astype(np.float32)
        pts[..., 2] = 0.0  # z=0 plane
        normals = estimate_pointcloud_normals(
            jnp.asarray(pts), neighborhood_size=20
        )
        nz = np.abs(np.asarray(normals)[0, :, 2])
        np.testing.assert_allclose(nz, 1.0, atol=1e-3)


class TestGraphConv:
    def test_gather_scatter(self):
        verts = jnp.asarray([[1.0], [2.0], [4.0]])
        edges = jnp.asarray([[0, 1], [1, 2], [-1, -1]], jnp.int32)
        out = gather_scatter(verts, edges)
        np.testing.assert_allclose(np.asarray(out), [[2.0], [5.0], [2.0]])

    def test_module(self):
        mesh = ico_sphere(0)
        verts = mesh.verts_packed()
        edges = mesh.edges_packed()
        gc = GraphConv(3, 8)
        params = gc.init(jax.random.PRNGKey(0), verts, edges)
        out = gc.apply(params, verts, edges)
        assert out.shape == (verts.shape[0], 8)


class TestSubdivide:
    def test_ico(self):
        m0 = ico_sphere(0)  # 12 verts, 20 faces, 30 edges
        sub = SubdivideMeshes()
        m1 = sub(m0)
        assert int(m1.num_verts_per_mesh()[0]) == 42  # 12 + 30
        assert int(m1.num_faces_per_mesh()[0]) == 80
        # subdivided faces index valid verts
        f = np.asarray(m1.faces_padded()[0][: 80])
        assert f.min() >= 0 and f.max() < 42
        # midpoints lie on chords of unit sphere: norms in (0.9, 1.0]
        v = np.asarray(m1.verts_padded()[0][:42])
        r = np.linalg.norm(v, axis=-1)
        assert (r > 0.85).all() and (r < 1.0 + 1e-5).all()

    def test_heterogeneous(self):
        m = Meshes.create(
            [np.asarray(ico_sphere(0).verts_padded()[0]),
             np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)],
            [np.asarray(ico_sphere(0).faces_padded()[0]),
             np.asarray([[0, 1, 2]], np.int32)],
        )
        m1 = SubdivideMeshes()(m)
        assert int(m1.num_verts_per_mesh()[1]) == 6
        assert int(m1.num_faces_per_mesh()[1]) == 4


class TestUtils:
    def test_wmean(self):
        x = jnp.asarray(np.random.RandomState(12).rand(2, 5, 3), jnp.float32)
        w = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
        out = wmean(x, w)
        np.testing.assert_allclose(
            np.asarray(out)[0, 0], np.asarray(x)[0, :3].mean(0), rtol=1e-5
        )

    def test_masked_gather(self):
        pts = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
        idx = jnp.asarray([[0, 2, -1]], jnp.int32)
        out = masked_gather(pts, idx)
        assert (np.asarray(out)[0, 2] == 0).all()
        np.testing.assert_allclose(np.asarray(out)[0, 1], [6, 7, 8])


class TestPaddingIndependence:
    """Batched (padded) results must equal single-mesh results — the
    regression class of the pad-edges-at-0 bug (padding edges inflated
    vertex-0 degrees in every edge-segment-sum op)."""

    def _two_meshes(self):
        from pytorch3d_tpu.utils import ico_sphere

        m0 = ico_sphere(1)
        m1 = ico_sphere(0)
        v1 = m1.verts_padded()[0] * 1.3 + 0.1
        return m0, m1.update_padded(v1[None])

    def test_taubin_batched_equals_single(self):
        from pytorch3d_tpu.ops import taubin_smoothing
        from pytorch3d_tpu.structures import Meshes

        m0, m1 = self._two_meshes()
        batch = Meshes.create(
            [m0.verts_padded()[0], m1.verts_padded()[0]],
            [m0.faces_padded()[0], m1.faces_padded()[0]],
        )
        sm_b = taubin_smoothing(batch, num_iter=3)
        sm_0 = taubin_smoothing(m0, num_iter=3)
        sm_1 = taubin_smoothing(m1, num_iter=3)
        np.testing.assert_allclose(
            np.asarray(sm_b.verts_padded()[0]),
            np.asarray(sm_0.verts_padded()[0]),
            atol=1e-6,
        )
        n1 = int(m1.num_verts_per_mesh()[0])
        np.testing.assert_allclose(
            np.asarray(sm_b.verts_padded()[1][:n1]),
            np.asarray(sm_1.verts_padded()[0][:n1]),
            atol=1e-6,
        )

    def test_gather_scatter_ignores_padding_edges(self):
        from pytorch3d_tpu.ops.graph_conv import gather_scatter

        x = jnp.asarray([[1.0], [2.0], [4.0]])
        edges = jnp.asarray([[0, 1], [1, 2], [-1, -1], [-1, -1]], jnp.int32)
        out = np.asarray(gather_scatter(x, edges))
        # vertex 0 sums only neighbor 1 (padding edges contribute nothing)
        np.testing.assert_allclose(out, [[2.0], [5.0], [2.0]])

    def test_uniform_laplacian_loss_batched_equals_weighted_singles(self):
        from pytorch3d_tpu.loss import mesh_laplacian_smoothing
        from pytorch3d_tpu.structures import Meshes

        m0, m1 = self._two_meshes()
        batch = Meshes.create(
            [m0.verts_padded()[0], m1.verts_padded()[0]],
            [m0.faces_padded()[0], m1.faces_padded()[0]],
        )
        lb = float(mesh_laplacian_smoothing(batch))
        l0 = float(mesh_laplacian_smoothing(m0))
        l1 = float(mesh_laplacian_smoothing(m1))
        np.testing.assert_allclose(lb, (l0 + l1) / 2.0, rtol=1e-5)


class TestIndexHelpers:
    """ravel_index/unravel_index (reference cubify.py:18,:37) and
    parse_image_size (reference renderer/utils.py:441)."""

    def test_ravel_unravel_roundtrip(self):
        from pytorch3d_tpu.ops.cubify import ravel_index, unravel_index

        rng = np.random.RandomState(0)
        dims4 = (2, 3, 4, 5)
        lin = jnp.asarray(rng.randint(0, np.prod(dims4), 20))
        coords = unravel_index(lin, dims4)
        assert coords.shape == (20, 4)
        # rebuild linear index manually
        n, h, w, d = [coords[:, i] for i in range(4)]
        rebuilt = ((n * dims4[1] + h) * dims4[2] + w) * dims4[3] + d
        np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(lin))

        idx3 = jnp.asarray(rng.randint(0, 3, (10, 3)))
        lin3 = ravel_index(idx3, (3, 4, 5))
        np.testing.assert_array_equal(
            np.asarray(lin3),
            np.asarray(idx3[:, 0] * 20 + idx3[:, 1] * 5 + idx3[:, 2]),
        )
        with pytest.raises(ValueError):
            ravel_index(idx3, (3, 4))
        with pytest.raises(ValueError):
            unravel_index(lin, (3, 4, 5))

    def test_parse_image_size(self):
        from pytorch3d_tpu.renderer.utils import parse_image_size

        assert parse_image_size(64) == (64, 64)
        assert parse_image_size((32, 48)) == (32, 48)
        assert parse_image_size([32, 48]) == (32, 48)
        with pytest.raises(ValueError):
            parse_image_size((1, 2, 3))
        with pytest.raises(ValueError):
            parse_image_size((0, 2))
        with pytest.raises(ValueError):
            parse_image_size((1.5, 2.0))
