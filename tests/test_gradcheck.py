"""Finite-difference gradient checks (the torch.autograd.gradcheck analog
the reference applies across its op suite, e.g.
tests/test_rasterize_meshes.py gradcheck usage).

Central differences at fp64-ish tolerances on small inputs for the
gradient-bearing hot ops: chamfer, laplacian smoothing, point-mesh
distance, soft rasterization fragments, splatter silhouette, pulsar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def fd_grad(f, x, eps=1e-3):
    """Central-difference gradient of scalar f at x (same shape as x)."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(jnp.asarray(x, jnp.float32)))
        flat[i] = orig - eps
        fm = float(f(jnp.asarray(x, jnp.float32)))
        flat[i] = orig
        gf[i] = (fp - fm) / (2 * eps)
    return g


def check(f, x, atol=1e-2, rtol=5e-2, eps=1e-3):
    ad = np.asarray(jax.grad(f)(jnp.asarray(x, jnp.float32)), np.float64)
    fd = fd_grad(f, x, eps)
    denom = np.maximum(np.abs(fd), 1.0)
    err = np.abs(ad - fd) / denom
    assert np.isfinite(ad).all()
    assert err.max() < rtol + atol, (
        f"gradcheck failed: max rel err {err.max():.4f}\nAD:\n{ad}\nFD:\n{fd}"
    )


class TestOpGradients:
    def test_chamfer(self):
        from pytorch3d_tpu.loss import chamfer_distance

        rng = np.random.RandomState(0)
        x = rng.randn(1, 6, 3).astype(np.float32)
        y = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))

        def f(xv):
            d, _ = chamfer_distance(xv, y)
            return d

        # nearest-neighbor switches make chamfer non-smooth: FD across a
        # switch point is noisy, hence the looser tolerance
        check(f, x, rtol=0.12)

    def test_laplacian_smoothing(self):
        from pytorch3d_tpu.loss import mesh_laplacian_smoothing
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(0)
        v = np.asarray(mesh.verts_padded())

        def f(vv):
            return mesh_laplacian_smoothing(mesh.update_padded(vv))

        check(f, v, eps=1e-3)

    def test_point_mesh_face(self):
        from pytorch3d_tpu.loss import point_mesh_face_distance
        from pytorch3d_tpu.structures import Meshes, Pointclouds
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(0)
        rng = np.random.RandomState(1)
        pts = rng.randn(1, 5, 3).astype(np.float32) * 0.5

        def f(p):
            pc = Pointclouds(
                _points_padded=p,
                _num_points_per_cloud=jnp.asarray([5]),
            )
            return point_mesh_face_distance(mesh, pc)

        check(f, pts)

    def test_soft_raster_fragments(self):
        """zbuf/dists gradients of the selection+recompute rasterizer."""
        from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
            interpolate_fragments,
            rasterize_topk_xla,
        )

        rng = np.random.RandomState(2)
        # a couple of triangles in front of the camera
        fv = np.asarray(
            [
                [[-0.5, -0.5, 1.0], [0.6, -0.4, 1.2], [0.0, 0.7, 1.4]],
                [[-0.3, -0.2, 1.5], [0.4, -0.3, 1.1], [0.1, 0.5, 1.3]],
            ],
            np.float32,
        )
        valid = jnp.ones((2,), bool)
        S, K, blur = 8, 2, 5e-2
        idx = rasterize_topk_xla(
            jnp.asarray(fv), valid, (S, S), blur, K
        )

        def f(v):
            z, b, d = interpolate_fragments(v, idx, (S, S), False, False)
            m = (idx >= 0).astype(z.dtype)
            return (
                jnp.sum(jax.nn.sigmoid(-d / 1e-2) * m)
                + 0.1 * jnp.sum(z * m)
            )

        check(f, fv, eps=1e-3, rtol=8e-2)

    def test_pulsar_position(self):
        from pytorch3d_tpu.renderer.points.pulsar import Renderer

        ren = Renderer(12, 12, 2)
        cam = jnp.asarray([0, 0, 0, 0, 0, 0, 0.1, 0.2], jnp.float32)
        pos = np.asarray(
            [[0.05, 0.02, 3.0], [-0.04, 0.01, 3.5]], np.float32
        )
        col = jnp.asarray([[1.0, 0.2, 0.1], [0.1, 0.9, 0.3]])
        rad = jnp.asarray([0.4, 0.3])

        def f(p):
            img = ren(
                p, col, rad, cam, gamma=0.5, max_depth=10.0,
                min_depth=0.1, bg_col=jnp.zeros((3,)),
            )
            return jnp.sum(img * jnp.linspace(0, 1, 12)[None, :, None])

        check(f, pos, eps=1e-3, rtol=8e-2)

    def test_normal_consistency(self):
        from pytorch3d_tpu.loss import mesh_normal_consistency
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(0)
        rng = np.random.RandomState(3)
        v = np.asarray(mesh.verts_padded()) + 0.05 * rng.randn(
            *mesh.verts_padded().shape
        ).astype(np.float32)

        def f(vv):
            return mesh_normal_consistency(mesh.update_padded(vv))

        check(f, v, eps=1e-3, rtol=8e-2)
