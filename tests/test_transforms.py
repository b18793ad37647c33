import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.transforms import (
    Rotate,
    RotateAxisAngle,
    Scale,
    Transform3d,
    Translate,
    acos_linear_extrapolation,
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    euler_angles_to_matrix,
    matrix_to_axis_angle,
    matrix_to_euler_angles,
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    quaternion_apply,
    quaternion_invert,
    quaternion_multiply,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    random_quaternions,
    random_rotations,
    rotation_6d_to_matrix,
    se3_exp_map,
    se3_log_map,
    so3_exp_map,
    so3_log_map,
    so3_relative_angle,
    so3_rotation_angle,
    hat,
    hat_inv,
)

KEY = jax.random.PRNGKey(7)


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


class TestRotationConversions:
    def test_quat_matrix_roundtrip(self):
        q = random_quaternions(32, key=KEY)
        m = quaternion_to_matrix(q)
        q2 = matrix_to_quaternion(m)
        m2 = quaternion_to_matrix(q2)
        assert_close(m, m2, atol=1e-5)
        # quaternions equal up to sign; matrix_to_quaternion standardizes.
        assert_close(jnp.abs(jnp.sum(q * q2, axis=-1)), jnp.ones(32), atol=1e-5)

    def test_matrix_is_rotation(self):
        m = random_rotations(16, key=KEY)
        eye = jnp.broadcast_to(jnp.eye(3), (16, 3, 3))
        assert_close(m @ jnp.swapaxes(m, -1, -2), eye, atol=1e-5)
        assert_close(jnp.linalg.det(m), jnp.ones(16), atol=1e-5)

    def test_axis_angle_roundtrip(self):
        key = jax.random.PRNGKey(3)
        aa = jax.random.normal(key, (24, 3)) * 1.5
        m = axis_angle_to_matrix(aa)
        aa2 = matrix_to_axis_angle(m)
        m2 = axis_angle_to_matrix(aa2)
        assert_close(m, m2, atol=1e-5)

    def test_axis_angle_small_angle(self):
        aa = jnp.array([[1e-8, 0.0, 0.0], [0.0, 0.0, 0.0]])
        m = axis_angle_to_matrix(aa)
        assert_close(m, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), atol=1e-6)
        # gradient must be finite at zero
        g = jax.grad(lambda a: axis_angle_to_matrix(a).sum())(jnp.zeros((1, 3)))
        assert np.isfinite(np.asarray(g)).all()

    def test_axis_angle_quat_consistency(self):
        key = jax.random.PRNGKey(11)
        aa = jax.random.normal(key, (10, 3))
        q = axis_angle_to_quaternion(aa)
        assert_close(quaternion_to_matrix(q), axis_angle_to_matrix(aa), atol=1e-5)
        assert_close(quaternion_to_axis_angle(q), aa, atol=1e-5)

    def test_euler_roundtrip(self):
        key = jax.random.PRNGKey(5)
        for convention in ["XYZ", "ZYX", "XZX", "YXY"]:
            e = jax.random.uniform(key, (12, 3), minval=-1.2, maxval=1.2)
            m = euler_angles_to_matrix(e, convention)
            e2 = matrix_to_euler_angles(m, convention)
            m2 = euler_angles_to_matrix(e2, convention)
            assert_close(m, m2, atol=1e-5)

    def test_euler_single_axis(self):
        angle = jnp.array([0.3])
        m = euler_angles_to_matrix(jnp.array([[0.3, 0.0, 0.0]]), "XYZ")
        c, s = math.cos(0.3), math.sin(0.3)
        expected = jnp.array([[[1, 0, 0], [0, c, -s], [0, s, c]]])
        assert_close(m, expected, atol=1e-6)

    def test_rotation_6d_roundtrip(self):
        m = random_rotations(20, key=jax.random.PRNGKey(9))
        d6 = matrix_to_rotation_6d(m)
        m2 = rotation_6d_to_matrix(d6)
        assert_close(m, m2, atol=1e-5)

    def test_quaternion_multiply_apply(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        q1 = random_quaternions(8, key=k1)
        q2 = random_quaternions(8, key=k2)
        pts = jax.random.normal(k1, (8, 3))
        # composition consistency: R(q1 q2) == R(q1) R(q2)
        q12 = quaternion_multiply(q1, q2)
        assert_close(
            quaternion_to_matrix(q12),
            quaternion_to_matrix(q1) @ quaternion_to_matrix(q2),
            atol=1e-5,
        )
        # apply == matrix action (row-vec: matrix @ point as column)
        out = quaternion_apply(q1, pts)
        out_m = jnp.einsum("nij,nj->ni", quaternion_to_matrix(q1), pts)
        assert_close(out, out_m, atol=1e-5)
        # inverse undoes
        assert_close(quaternion_apply(quaternion_invert(q1), out), pts, atol=1e-5)


class TestSO3SE3:
    def test_hat_roundtrip(self):
        v = jax.random.normal(KEY, (10, 3))
        assert_close(hat_inv(hat(v)), v)

    def test_so3_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(4)
        log_rot = jax.random.normal(key, (32, 3))
        # keep away from pi to avoid log branch ambiguity
        log_rot = log_rot / jnp.linalg.norm(log_rot, axis=-1, keepdims=True)
        log_rot = log_rot * jax.random.uniform(key, (32, 1), minval=0.01, maxval=3.0)
        R = so3_exp_map(log_rot)
        log2 = so3_log_map(R)
        assert_close(so3_exp_map(log2), R, atol=1e-4)
        assert_close(log2, log_rot, atol=1e-4)

    def test_so3_rotation_angle(self):
        angles = jnp.array([0.1, 0.5, 1.5, 3.0])
        axes = jnp.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, 0.8, 0]])
        R = so3_exp_map(axes * angles[:, None])
        assert_close(so3_rotation_angle(R), angles, atol=1e-4)

    def test_so3_relative_angle(self):
        R1 = random_rotations(6, key=jax.random.PRNGKey(1))
        assert_close(so3_relative_angle(R1, R1), jnp.zeros(6), atol=2e-2)

    def test_se3_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(8)
        log_tr = jax.random.normal(key, (16, 6))
        T = se3_exp_map(log_tr)
        # bottom row structure: [:, :3, 3] == 0, [:, 3, 3] == 1
        assert_close(T[:, :3, 3], jnp.zeros((16, 3)), atol=1e-6)
        assert_close(T[:, 3, 3], jnp.ones(16), atol=1e-6)
        log2 = se3_log_map(T)
        assert_close(se3_exp_map(log2), T, atol=1e-4)

    def test_se3_identity(self):
        T = se3_exp_map(jnp.zeros((1, 6)))
        assert_close(T[0], jnp.eye(4), atol=1e-5)


class TestTransform3d:
    def test_translate(self):
        t = Translate(jnp.array([[1.0, 2.0, 3.0]]))
        pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        assert_close(t.transform_points(pts), pts + jnp.array([1.0, 2.0, 3.0]))

    def test_scale_isotropic(self):
        s = Scale(2.0)
        pts = jnp.array([[1.0, -1.0, 0.5]])
        assert_close(s.transform_points(pts), pts * 2.0)

    def test_compose_and_inverse(self):
        t = Translate(jnp.array([[1.0, 0.0, 0.0]]))
        s = Scale(3.0)
        ts = t.compose(s)  # translate then scale
        pts = jnp.array([[1.0, 1.0, 1.0]])
        assert_close(ts.transform_points(pts), (pts + jnp.array([1.0, 0, 0])) * 3.0)
        inv = ts.inverse()
        assert_close(inv.transform_points(ts.transform_points(pts)), pts, atol=1e-5)

    def test_rotate_axis_angle(self):
        # 90 deg about Z maps +X to +Y for ccw row-vector rotation
        r = RotateAxisAngle(90.0, axis="Z")
        pts = jnp.array([[1.0, 0.0, 0.0]])
        out = r.transform_points(pts)
        assert_close(out, jnp.array([[0.0, 1.0, 0.0]]), atol=1e-6)

    def test_transform_normals(self):
        s = Scale(jnp.array([[2.0, 1.0, 1.0]]))
        n = jnp.array([[1.0, 0.0, 0.0]])
        out = s.transform_normals(n)
        assert_close(out, jnp.array([[0.5, 0.0, 0.0]]), atol=1e-6)

    def test_pytree(self):
        t = Translate(jnp.array([[1.0, 2.0, 3.0]]))
        leaves = jax.tree_util.tree_leaves(t)
        assert len(leaves) == 1
        # jittable
        f = jax.jit(lambda tr, p: tr.transform_points(p))
        pts = jnp.zeros((4, 3))
        assert_close(f(t, pts), jnp.broadcast_to(jnp.array([1.0, 2.0, 3.0]), (4, 3)))

    def test_getitem_len(self):
        t = Translate(jnp.ones((5, 3)))
        assert len(t) == 5
        assert len(t[2]) == 1
        assert len(t[1:4]) == 3


class TestMath:
    def test_acos_linear_extrapolation(self):
        x = jnp.linspace(-1.2, 1.2, 101)
        y = acos_linear_extrapolation(x)
        assert np.isfinite(np.asarray(y)).all()
        inside = jnp.abs(x) < 0.9
        assert_close(
            jnp.where(inside, y, 0.0), jnp.where(inside, jnp.arccos(x), 0.0), atol=1e-5
        )
        g = jax.vmap(jax.grad(acos_linear_extrapolation))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestSymeig3x3:
    def test_matches_numpy(self):
        from pytorch3d_tpu.common import symeig3x3

        key = jax.random.PRNGKey(12)
        A = jax.random.normal(key, (50, 3, 3))
        A = A + jnp.swapaxes(A, -1, -2)
        evals, evecs = symeig3x3(A, eigenvectors=True)
        ref_vals = np.linalg.eigvalsh(np.asarray(A))
        assert_close(evals, ref_vals, atol=1e-4, rtol=1e-3)
        # eigenvector property: A v = lambda v
        for i in range(3):
            Av = jnp.einsum("nij,nj->ni", A, evecs[..., i])
            lv = evals[..., i, None] * evecs[..., i]
            assert_close(Av, lv, atol=1e-3, rtol=1e-2)

    def test_degenerate(self):
        from pytorch3d_tpu.common import symeig3x3

        A = jnp.broadcast_to(jnp.eye(3) * 2.0, (4, 3, 3))
        evals, evecs = symeig3x3(A, eigenvectors=True)
        assert_close(evals, jnp.full((4, 3), 2.0), atol=1e-5)
        # eigenvectors orthonormal
        vtv = jnp.einsum("nij,nik->njk", evecs, evecs)
        assert_close(vtv, jnp.broadcast_to(jnp.eye(3), (4, 3, 3)), atol=1e-4)

    def test_grad_finite(self):
        from pytorch3d_tpu.common import symeig3x3

        def f(a):
            A = a + jnp.swapaxes(a, -1, -2)
            vals, _ = symeig3x3(A, eigenvectors=False)
            return vals.sum()

        g = jax.grad(f)(jnp.asarray(np.random.RandomState(0).randn(2, 3, 3), jnp.float32))
        assert np.isfinite(np.asarray(g)).all()


class TestRotationEdgeCases:
    """Singularity / near-singularity behavior of the rotation and
    SE(3)/SO(3) conversions (the reference's test_so3/test_se3 edge
    scenarios, re-derived): angles near 0, near pi, exactly pi, and
    gimbal-lock eulers."""

    def _compare_with_reference_log(self, R):
        import sys

        sys.path.insert(0, "tests")
        from reference_compat import import_reference

        ref = import_reference()
        if ref is None:
            return
        import torch

        from pytorch3d.transforms import so3_log_map as ref_log

        ours = np.asarray(so3_log_map(jnp.asarray(R)))
        want = ref_log(torch.from_numpy(np.asarray(R))).numpy()
        # log is unique up to 2*pi*k flips of axis at pi; compare the
        # induced rotations instead of raw vectors
        R_ours = np.asarray(so3_exp_map(jnp.asarray(ours)))
        R_want = np.asarray(so3_exp_map(jnp.asarray(want)))
        np.testing.assert_allclose(R_ours, R_want, atol=1e-4)

    def test_so3_log_near_pi(self):
        axis = np.array([1.0, 2.0, -1.0], np.float32)
        axis /= np.linalg.norm(axis)
        for angle in [np.pi - 1e-3, np.pi - 1e-5]:
            v = (axis * angle)[None]
            R = so3_exp_map(jnp.asarray(v))
            log = so3_log_map(R)
            R2 = so3_exp_map(log)
            np.testing.assert_allclose(
                np.asarray(R), np.asarray(R2), atol=1e-3
            )
            self._compare_with_reference_log(np.asarray(R))

    def test_so3_log_tiny_angle_grad_finite(self):
        v = jnp.asarray([[1e-8, -1e-8, 1e-8]])

        def f(v):
            return jnp.sum(so3_log_map(so3_exp_map(v)) ** 2)

        g = jax.grad(f)(v)
        assert np.isfinite(np.asarray(g)).all()

    def test_axis_angle_pi_exact(self):
        # rotation by exactly pi about each principal axis
        for ax in np.eye(3, dtype=np.float32):
            aa = jnp.asarray((ax * np.pi)[None])
            R = axis_angle_to_matrix(aa)
            # R should be symmetric with trace -1 (angle pi)
            np.testing.assert_allclose(
                np.asarray(R[0]), np.asarray(R[0]).T, atol=1e-5
            )
            np.testing.assert_allclose(float(jnp.trace(R[0])), -1.0, atol=1e-5)
            back = matrix_to_axis_angle(R)
            R2 = axis_angle_to_matrix(back)
            np.testing.assert_allclose(
                np.asarray(R), np.asarray(R2), atol=1e-4
            )

    def test_quaternion_double_cover(self):
        q = random_quaternions(8, key=jax.random.PRNGKey(0))
        Rq = quaternion_to_matrix(q)
        Rnq = quaternion_to_matrix(-q)
        np.testing.assert_allclose(
            np.asarray(Rq), np.asarray(Rnq), atol=1e-5
        )
        # matrix_to_quaternion returns the representative with w >= 0
        back = matrix_to_quaternion(Rq)
        assert (np.asarray(back[:, 0]) >= -1e-6).all()

    def test_euler_gimbal_lock(self):
        # middle angle = pi/2 (gimbal lock for XYZ)
        angles = jnp.asarray([[0.3, np.pi / 2, -0.2]])
        R = euler_angles_to_matrix(angles, "XYZ")
        back = matrix_to_euler_angles(R, "XYZ")
        R2 = euler_angles_to_matrix(back, "XYZ")
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_se3_log_near_pi_rotation(self):
        axis = np.array([0.0, 1.0, 0.0], np.float32)
        v = np.concatenate([[0.2, -0.1, 0.3], axis * (np.pi - 1e-4)])[None]
        T = se3_exp_map(jnp.asarray(v.astype(np.float32)))
        log = se3_log_map(T)
        T2 = se3_exp_map(log)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=1e-3)

    def test_rotation_6d_degenerate_input(self):
        # nearly-parallel 6D input still yields a valid rotation
        d6 = jnp.asarray([[1.0, 0.0, 0.0, 1.0 + 1e-6, 1e-7, 0.0]])
        R = rotation_6d_to_matrix(d6)
        RtR = np.asarray(R[0]) @ np.asarray(R[0]).T
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)
