"""Tests for losses: chamfer, edge, laplacian, normal consistency,
point-mesh distances (naive numpy oracles, reference tests/test_chamfer.py
etc.)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.loss import (
    chamfer_distance,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
    point_mesh_edge_distance,
    point_mesh_face_distance,
)
from pytorch3d_tpu.structures import Meshes, Pointclouds
from pytorch3d_tpu.utils import ico_sphere


def _np_chamfer(x, y):
    d = np.sum((x[:, None] - y[None]) ** 2, -1)
    return d.min(1).mean() + d.min(0).mean()


class TestChamfer:
    def test_vs_naive(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 13, 3).astype(np.float32)
        y = rng.randn(2, 17, 3).astype(np.float32)
        loss, _ = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
        ref = np.mean([_np_chamfer(x[n], y[n]) for n in range(2)])
        np.testing.assert_allclose(float(loss), ref, rtol=1e-4)

    def test_zero_for_identical(self):
        x = jnp.asarray(np.random.RandomState(1).randn(1, 10, 3), jnp.float32)
        loss, _ = chamfer_distance(x, x)
        assert float(loss) < 1e-6

    def test_normals_and_reductions(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 10, 3), jnp.float32)
        y = jnp.asarray(rng.randn(2, 12, 3), jnp.float32)
        xn = jnp.asarray(rng.randn(2, 10, 3), jnp.float32)
        yn = jnp.asarray(rng.randn(2, 12, 3), jnp.float32)
        loss, loss_n = chamfer_distance(
            x, y, x_normals=xn, y_normals=yn, batch_reduction="sum",
            point_reduction="sum",
        )
        assert loss_n is not None and np.isfinite(float(loss_n))
        l1, _ = chamfer_distance(x, y, norm=1)
        assert np.isfinite(float(l1))
        lsd, _ = chamfer_distance(x, y, single_directional=True)
        assert np.isfinite(float(lsd))
        lmax, _ = chamfer_distance(x, y, point_reduction="max")
        assert np.isfinite(float(lmax))

    def test_pointclouds_input(self):
        pc1 = Pointclouds.create([np.random.RandomState(3).rand(8, 3).astype(np.float32),
                                  np.random.RandomState(4).rand(5, 3).astype(np.float32)])
        pc2 = Pointclouds.create([np.random.RandomState(5).rand(7, 3).astype(np.float32),
                                  np.random.RandomState(6).rand(9, 3).astype(np.float32)])
        loss, _ = chamfer_distance(pc1, pc2)
        # oracle over true (unpadded) points
        ref = 0.0
        for n in range(2):
            xs = np.asarray(pc1.points_padded()[n][: int(pc1.num_points_per_cloud()[n])])
            ys = np.asarray(pc2.points_padded()[n][: int(pc2.num_points_per_cloud()[n])])
            ref += _np_chamfer(xs, ys)
        np.testing.assert_allclose(float(loss), ref / 2, rtol=1e-4)

    def test_grad(self):
        x = jnp.asarray(np.random.RandomState(7).randn(1, 6, 3), jnp.float32)
        y = jnp.asarray(np.random.RandomState(8).randn(1, 7, 3), jnp.float32)
        g = jax.grad(lambda a: chamfer_distance(a, y)[0])(x)
        assert np.abs(np.asarray(g)).sum() > 0


class TestMeshLosses:
    def test_edge_loss_unit(self):
        verts = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
        )
        faces = np.asarray([[0, 1, 2]], np.int32)
        m = Meshes.create([verts], [faces])
        # edges: (0,1) len 1, (0,2) len 1, (1,2) len sqrt2
        ref = ((1 - 0) ** 2 + (1 - 0) ** 2 + (np.sqrt(2) - 0) ** 2) / 3
        np.testing.assert_allclose(float(mesh_edge_loss(m)), ref, rtol=1e-5)

    def test_laplacian_sphere_small(self):
        m = ico_sphere(1)
        for method in ("uniform", "cot", "cotcurv"):
            val = float(mesh_laplacian_smoothing(m, method=method))
            assert np.isfinite(val) and val >= 0

    def test_laplacian_uniform_flat(self):
        # a flat regular grid has near-zero uniform laplacian at interior verts
        m = ico_sphere(2)
        v_small = float(mesh_laplacian_smoothing(ico_sphere(3), "uniform"))
        v_big = float(mesh_laplacian_smoothing(ico_sphere(1), "uniform"))
        assert v_small < v_big  # finer sphere is smoother

    def test_normal_consistency_flat_zero(self):
        # two coplanar triangles sharing an edge -> zero loss
        verts = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
        )
        faces = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
        m = Meshes.create([verts], [faces])
        assert abs(float(mesh_normal_consistency(m))) < 1e-6

    def test_normal_consistency_bent(self):
        verts = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32
        )
        faces = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
        m = Meshes.create([verts], [faces])
        assert float(mesh_normal_consistency(m)) > 0.01


class TestPointMesh:
    def test_point_on_mesh_zero(self):
        m = ico_sphere(1)
        # points exactly at vertices -> point->face distance 0
        pts = np.asarray(m.verts_padded()[0][:10])
        pc = Pointclouds.create([pts])
        d = float(point_mesh_face_distance(m, pc))
        # face->point is not 0, but point->face contributes ~0; just sanity
        assert d >= 0 and np.isfinite(d)

    def test_point_above_triangle(self):
        verts = np.asarray(
            [[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32
        )
        faces = np.asarray([[0, 1, 2]], np.int32)
        m = Meshes.create([verts], [faces])
        pc = Pointclouds.create([np.asarray([[0.5, 0.5, 1.0]], np.float32)])
        # point->face = 1.0 (plane dist), face->point = 1.0
        d = float(point_mesh_face_distance(m, pc))
        np.testing.assert_allclose(d, 2.0, rtol=1e-4)

    def test_point_edge(self):
        verts = np.asarray(
            [[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32
        )
        faces = np.asarray([[0, 1, 2]], np.int32)
        m = Meshes.create([verts], [faces])
        pc = Pointclouds.create([np.asarray([[1.0, -1.0, 0.0]], np.float32)])
        # point->edge: nearest edge (v0,v1) at squared dist 1.
        # edge->point: per-edge squared dists {1, 2, 2}, mean 5/3.
        d = float(point_mesh_edge_distance(m, pc))
        np.testing.assert_allclose(d, 1.0 + 5.0 / 3.0, rtol=1e-4)

    def test_grad(self):
        m = ico_sphere(0)
        pts = jnp.asarray(np.random.RandomState(9).rand(1, 5, 3), jnp.float32)

        def loss(p):
            pc = Pointclouds.create(p)
            return point_mesh_face_distance(m, pc)

        g = jax.grad(loss)(pts)
        assert np.isfinite(np.asarray(g)).all()
