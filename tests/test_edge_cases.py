"""Edge-case / degenerate-input coverage beyond the happy-path parity
sweeps (VERDICT r3 missing #3):

- marching cubes: exhaustive 256-configuration single-cube sweep against
  the reference's naive python implementation (the reference enumerates 15
  canonical cases in tests/test_marching_cubes.py:43-555; all 256 corner
  sign patterns subsume them), plus flat/degenerate volumes.
- KNN: variable-length (ragged) gradient grid vs a dense masked oracle
  (reference tests/test_knn.py:135 `_knn_vs_python_ragged_helper`).
- cameras: degenerate and boundary configurations.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.ops import knn_points, marching_cubes

# --------------------------------------------------------------------------
# marching cubes
# --------------------------------------------------------------------------


def _ref_naive_mc(vol_np, isolevel):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from reference_compat import import_reference

    import_reference()
    import torch
    from pytorch3d.ops.marching_cubes import (
        marching_cubes_naive as ref_mc,
    )

    v, f = ref_mc(
        torch.tensor(vol_np), isolevel=isolevel, return_local_coords=False
    )
    v0, f0 = v[0], f[0]
    if not torch.is_tensor(v0):  # empty surfaces come back as lists
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    return v0.numpy(), f0.numpy()


def _tri_soup(verts, faces, decimals=5):
    """Orientation-independent canonical form of a triangle soup."""
    tris = set()
    for tri in np.asarray(faces):
        pts = [tuple(np.round(np.asarray(verts)[i], decimals)) for i in tri]
        tris.add(frozenset(pts))
    return tris


class TestMarchingCubesExhaustive:
    def test_all_256_cube_configurations(self):
        """Ours == reference naive on every corner sign pattern of a
        single cell (topology as unordered triangle soup; vertex coords
        land on edge midpoints for 0/1 volumes at iso 0.5, so they are
        exactly comparable)."""
        mismatches = []
        for config in range(256):
            vol = np.zeros((1, 2, 2, 2), np.float32)
            for bit in range(8):
                z, y, x = bit >> 2 & 1, bit >> 1 & 1, bit & 1
                vol[0, z, y, x] = float(config >> bit & 1)
            vs, fs = marching_cubes(
                jnp.asarray(vol), isolevel=0.5, return_local_coords=False
            )
            rv, rf = _ref_naive_mc(vol, 0.5)
            ours = _tri_soup(np.asarray(vs[0]), np.asarray(fs[0]))
            ref = _tri_soup(rv, rf)
            if ours != ref:
                mismatches.append((config, len(ours), len(ref)))
        assert not mismatches, f"configs differ from reference: {mismatches}"

    def test_flat_volume_empty(self):
        for c in (0.0, 1.0, 0.5):
            vol = jnp.full((1, 3, 3, 3), c)
            vs, fs = marching_cubes(vol, isolevel=0.5)
            assert fs[0].shape[0] == 0

    def test_isolevel_exactly_on_values(self):
        # values == isolevel must not NaN (zero-length interpolation)
        vol = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0, 0].set(0.5)
        vs, fs = marching_cubes(vol, isolevel=0.5, return_local_coords=False)
        assert np.isfinite(np.asarray(vs[0])).all()

    def test_two_blob_topology(self):
        # two disjoint occupied corners -> two separate surface patches
        vol = np.zeros((1, 3, 3, 3), np.float32)
        vol[0, 0, 0, 0] = 1.0
        vol[0, 2, 2, 2] = 1.0
        vs, fs = marching_cubes(
            jnp.asarray(vol), isolevel=0.5, return_local_coords=False
        )
        rv, rf = _ref_naive_mc(vol, 0.5)
        assert _tri_soup(np.asarray(vs[0]), np.asarray(fs[0])) == _tri_soup(
            rv, rf
        )

    def test_local_coords_range(self):
        vol = np.zeros((1, 4, 4, 4), np.float32)
        vol[0, 1:3, 1:3, 1:3] = 1.0
        vs, _ = marching_cubes(jnp.asarray(vol), isolevel=0.5)
        v = np.asarray(vs[0])
        assert v.size and (v >= -1.0).all() and (v <= 1.0).all()


# --------------------------------------------------------------------------
# KNN ragged gradients
# --------------------------------------------------------------------------


def _naive_knn_dists(p1, p2, lengths1, lengths2, K, norm):
    """Dense masked oracle: full pairwise distances + top-k, zero-filled
    exactly like the public contract."""
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    if norm == 2:
        d = jnp.sum((p1[:, :, None] - p2[:, None]) ** 2, -1)
    else:
        d = jnp.sum(jnp.abs(p1[:, :, None] - p2[:, None]), -1)
    mask2 = jnp.arange(P2)[None, None, :] < lengths2[:, None, None]
    d = jnp.where(mask2, d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, K)
    dists = -neg
    valid_k = jnp.arange(K)[None, None, :] < lengths2[:, None, None]
    dists = jnp.where(valid_k, dists, 0.0)
    mask1 = jnp.arange(P1)[None, :, None] < lengths1[:, None, None]
    return jnp.where(mask1, dists, 0.0)


class TestKnnRaggedGrads:
    @pytest.mark.parametrize("D", [3, 5, 8])
    @pytest.mark.parametrize("K", [1, 3, 10])
    @pytest.mark.parametrize("norm", [1, 2])
    def test_grads_match_naive(self, D, K, norm):
        N, P1, P2 = 4, 24, 16
        rng = np.random.RandomState(D * 100 + K * 10 + norm)
        p1 = jnp.asarray(rng.rand(N, P1, D).astype(np.float32))
        p2 = jnp.asarray(rng.rand(N, P2, D).astype(np.float32))
        lengths1 = jnp.asarray(rng.randint(1, P1, size=N), jnp.int32)
        lengths2 = jnp.asarray(rng.randint(1, P2, size=N), jnp.int32)

        def loss_ours(p1, p2):
            out = knn_points(
                p1, p2, lengths1=lengths1, lengths2=lengths2, K=K,
                norm=norm,
            )
            return jnp.sum(out.dists)

        def loss_naive(p1, p2):
            return jnp.sum(
                _naive_knn_dists(p1, p2, lengths1, lengths2, K, norm)
            )

        v_o, (g1_o, g2_o) = jax.value_and_grad(loss_ours, (0, 1))(p1, p2)
        v_n, (g1_n, g2_n) = jax.value_and_grad(loss_naive, (0, 1))(p1, p2)
        np.testing.assert_allclose(float(v_o), float(v_n), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g1_o), np.asarray(g1_n), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(g2_o), np.asarray(g2_n), atol=5e-6
        )

    def test_invalid_norm(self):
        p = jnp.zeros((1, 4, 3))
        with pytest.raises(ValueError, match="norm 1 or 2"):
            knn_points(p, p, K=2, norm=3)
        with pytest.raises(ValueError, match="norm 1 or 2"):
            knn_points(p, p, K=2, norm=0)

    def test_k_larger_than_p2(self):
        # K > valid length: trailing slots zero-filled like the reference
        p1 = jnp.asarray(np.random.RandomState(0).rand(2, 6, 3), jnp.float32)
        p2 = jnp.asarray(np.random.RandomState(1).rand(2, 4, 3), jnp.float32)
        lengths2 = jnp.asarray([2, 4], jnp.int32)
        out = knn_points(p1, p2, lengths2=lengths2, K=4)
        d = np.asarray(out.dists)
        assert (d[0, :, 2:] == 0).all()  # beyond lengths2[0]=2
        assert np.isfinite(d).all()


# --------------------------------------------------------------------------
# camera edge cases
# --------------------------------------------------------------------------


class TestCameraEdgeCases:
    def test_look_at_degenerate_direction(self):
        # camera position == at point: rotation must stay finite
        from pytorch3d_tpu.renderer import look_at_view_transform

        R, T = look_at_view_transform(dist=0.0, elev=0.0, azim=0.0)
        assert np.isfinite(np.asarray(R)).all()
        assert np.isfinite(np.asarray(T)).all()

    def test_look_at_up_parallel_to_view(self):
        # up vector parallel to the viewing direction (reference warns and
        # falls back; must not produce NaN)
        from pytorch3d_tpu.renderer import look_at_view_transform

        R, T = look_at_view_transform(
            eye=((0.0, 1.0, 0.0),), at=((0.0, 0.0, 0.0),),
            up=((0.0, 1.0, 0.0),),
        )
        assert np.isfinite(np.asarray(R)).all()

    def test_unproject_points_roundtrip_at_near_plane(self):
        from pytorch3d_tpu.renderer import FoVPerspectiveCameras

        cams = FoVPerspectiveCameras.create(znear=0.1, zfar=10.0)
        xy_depth = jnp.asarray([[[0.2, -0.3, 0.1], [0.0, 0.0, 10.0]]])
        world = cams.unproject_points(xy_depth)
        back = cams.transform_points(world)
        np.testing.assert_allclose(
            np.asarray(back)[..., :2], np.asarray(xy_depth)[..., :2],
            atol=1e-3,
        )

    def test_transform_points_at_camera_plane_finite(self):
        # z == 0 in view space hits the perspective divide guard
        from pytorch3d_tpu.renderer import PerspectiveCameras

        cams = PerspectiveCameras.create()
        pts = jnp.asarray([[[0.1, 0.2, 0.0], [0.3, -0.1, 1e-8]]])
        out = cams.transform_points(pts, eps=1e-6)
        assert np.isfinite(np.asarray(out)).all()

    def test_zero_fov_rejected_or_finite(self):
        from pytorch3d_tpu.renderer import FoVPerspectiveCameras

        cams = FoVPerspectiveCameras.create(fov=0.0)
        P = cams.get_projection_transform().get_matrix()
        # tan(0)=0 -> division by zero in the projection; reference
        # produces inf (documented) — we must not produce garbage silently
        assert np.isinf(np.asarray(P)).any() or np.isfinite(
            np.asarray(P)
        ).all()

    def test_getitem_out_of_range(self):
        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )

        R, T = look_at_view_transform(
            dist=2.7, elev=jnp.asarray([0.0, 10.0]),
            azim=jnp.asarray([0.0, 30.0]),
        )
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        with pytest.raises(IndexError):
            cams[5]

    def test_orthographic_ignores_z_divide(self):
        from pytorch3d_tpu.renderer import FoVOrthographicCameras

        cams = FoVOrthographicCameras.create()
        pts = jnp.asarray([[[0.1, 0.2, 0.0]]])  # z=0 fine for ortho
        out = cams.transform_points(pts)
        assert np.isfinite(np.asarray(out)).all()
