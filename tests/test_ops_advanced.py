"""Tests for cubify, marching cubes, ePnP, box3d IoU, points->volumes,
cameras alignment (reference tests/test_cubify.py, test_marching_cubes.py,
test_perspective_n_points.py, test_iou_box3d.py, test_points_to_volumes.py,
test_camera_alignment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.ops import (
    add_points_features_to_volume_densities_features,
    box3d_overlap,
    corresponding_cameras_alignment,
    cubify,
    efficient_pnp,
    marching_cubes,
)
from pytorch3d_tpu.renderer import FoVPerspectiveCameras, look_at_view_transform
from pytorch3d_tpu.structures import Meshes


class TestCubify:
    def test_single_voxel(self):
        vox = jnp.zeros((1, 3, 3, 3)).at[0, 1, 1, 1].set(1.0)
        m = cubify(vox, 0.5)
        assert int(m.num_verts_per_mesh()[0]) == 8
        assert int(m.num_faces_per_mesh()[0]) == 12
        # watertight: closed surface -> every edge shared by exactly 2 faces
        f = np.asarray(m.faces_padded()[0][:12])
        edges = {}
        for tri in f:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                e = tuple(sorted((tri[a], tri[b])))
                edges[e] = edges.get(e, 0) + 1
        assert all(v == 2 for v in edges.values())

    def test_two_adjacent_voxels_share_face(self):
        vox = jnp.zeros((1, 3, 3, 4))
        vox = vox.at[0, 1, 1, 1].set(1.0).at[0, 1, 1, 2].set(1.0)
        m = cubify(vox, 0.5)
        # 2 cubes sharing one face: 12 verts, 20 faces
        assert int(m.num_verts_per_mesh()[0]) == 12
        assert int(m.num_faces_per_mesh()[0]) == 20

    def test_outward_normals(self):
        vox = jnp.zeros((1, 3, 3, 3)).at[0, 1, 1, 1].set(1.0)
        m = cubify(vox, 0.5)
        nv = int(m.num_verts_per_mesh()[0])
        nf = int(m.num_faces_per_mesh()[0])
        v = np.asarray(m.verts_padded()[0][:nv])
        f = np.asarray(m.faces_padded()[0][:nf])
        center = v.mean(0)
        tri = v[f]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        outward = np.einsum("fi,fi->f", n, tri.mean(1) - center)
        assert (outward > 0).all()

    def test_batch_and_empty(self):
        vox = jnp.zeros((2, 3, 3, 3)).at[0, 1, 1, 1].set(1.0)
        m = cubify(vox, 0.5)
        assert int(m.num_faces_per_mesh()[1]) == 0


class TestMarchingCubes:
    def test_sphere(self):
        S = 17
        g = np.mgrid[0:S, 0:S, 0:S].astype(np.float32)  # (3, S, S, S) z,y,x
        c = (S - 1) / 2
        dist = np.sqrt(((g - c) ** 2).sum(0))
        vol = jnp.asarray(dist[None])  # (1, S, S, S)
        verts_l, faces_l = marching_cubes(vol, isolevel=5.0,
                                          return_local_coords=False)
        verts, faces = np.asarray(verts_l[0]), np.asarray(faces_l[0])
        assert verts.shape[0] > 100 and faces.shape[0] > 100
        # all vertices approximately on the radius-5 sphere
        r = np.linalg.norm(verts - c, axis=1)
        np.testing.assert_allclose(r, 5.0, atol=0.2)
        # faces index valid verts
        assert faces.min() >= 0 and faces.max() < verts.shape[0]
        # closed surface: Euler characteristic V - E + F = 2
        edges = set()
        for tri in faces:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                edges.add(tuple(sorted((int(tri[a]), int(tri[b])))))
        assert verts.shape[0] - len(edges) + faces.shape[0] == 2

    def test_local_coords(self):
        S = 9
        g = np.mgrid[0:S, 0:S, 0:S].astype(np.float32)
        c = (S - 1) / 2
        vol = jnp.asarray(np.sqrt(((g - c) ** 2).sum(0))[None])
        verts_l, _ = marching_cubes(vol, isolevel=3.0)
        v = np.asarray(verts_l[0])
        assert (np.abs(v) <= 1.0 + 1e-6).all()


class TestEfficientPnP:
    def test_recovers_pose(self):
        rng = np.random.RandomState(0)
        B, N = 2, 30
        x = rng.randn(B, N, 3).astype(np.float32)
        # ground-truth camera
        q, _ = np.linalg.qr(rng.randn(B, 3, 3))
        det = np.linalg.det(q)
        q[:, :, 0] *= det[:, None]
        T = np.asarray([[0.1, -0.2, 5.0], [0.3, 0.1, 6.0]], np.float32)
        x_cam = np.einsum("bni,bij->bnj", x, q) + T[:, None]
        y = x_cam[..., :2] / x_cam[..., 2:]
        sol = efficient_pnp(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(sol.R), q, atol=0.02)
        np.testing.assert_allclose(np.asarray(sol.T), T, atol=0.05)
        assert float(sol.err_2d.max()) < 1e-2


class TestBox3dOverlap:
    def _box(self, center, size, angle=0.0):
        # corners of an axis box rotated by angle around z
        sx, sy, sz = size
        unit = np.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
             [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32
        ) - 0.5
        pts = unit * np.asarray(size, np.float32)
        R = np.asarray(
            [[np.cos(angle), -np.sin(angle), 0],
             [np.sin(angle), np.cos(angle), 0],
             [0, 0, 1]], np.float32,
        )
        return pts @ R.T + np.asarray(center, np.float32)

    def test_identical(self):
        b = self._box((0, 0, 0), (2, 2, 2))[None]
        vol, iou = box3d_overlap(jnp.asarray(b), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(vol), [[8.0]], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(iou), [[1.0]], rtol=1e-4)

    def test_disjoint(self):
        b1 = self._box((0, 0, 0), (1, 1, 1))[None]
        b2 = self._box((5, 0, 0), (1, 1, 1))[None]
        vol, iou = box3d_overlap(jnp.asarray(b1), jnp.asarray(b2))
        np.testing.assert_allclose(np.asarray(vol), [[0.0]], atol=1e-5)

    def test_half_overlap(self):
        b1 = self._box((0, 0, 0), (2, 2, 2))[None]
        b2 = self._box((1, 0, 0), (2, 2, 2))[None]
        vol, iou = box3d_overlap(jnp.asarray(b1), jnp.asarray(b2))
        np.testing.assert_allclose(np.asarray(vol), [[4.0]], rtol=1e-3)
        np.testing.assert_allclose(np.asarray(iou), [[4.0 / 12.0]], rtol=1e-3)

    def test_rotated_45(self):
        # two unit squares-x-unit-height boxes, one rotated 45 deg: known IoU
        b1 = self._box((0, 0, 0), (1, 1, 1))[None]
        b2 = self._box((0, 0, 0), (1, 1, 1), angle=np.pi / 4)[None]
        vol, iou = box3d_overlap(jnp.asarray(b1), jnp.asarray(b2))
        # intersection of unit square with 45-rotated unit square is a
        # regular octagon of area 2*(sqrt(2)-1)
        area = 2 * (np.sqrt(2) - 1)
        np.testing.assert_allclose(np.asarray(vol), [[area]], rtol=1e-3)


class TestPointsToVolumes:
    def test_single_point_nearest(self):
        pts = jnp.asarray([[[0.0, 0.0, 0.0]]])  # center of grid
        feats = jnp.asarray([[[1.0, 2.0, 3.0]]])
        dens = jnp.zeros((1, 1, 5, 5, 5))
        f, d = add_points_features_to_volume_densities_features(
            pts, feats, dens, None, mode="nearest"
        )
        assert float(d[0, 0, 2, 2, 2]) == 1.0
        np.testing.assert_allclose(np.asarray(f[0, :, 2, 2, 2]), [1, 2, 3])

    def test_trilinear_mass_conserved(self):
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 40, 3)), jnp.float32)
        feats = jnp.ones((2, 40, 2))
        dens = jnp.zeros((2, 1, 8, 8, 8))
        f, d = add_points_features_to_volume_densities_features(
            pts, feats, dens, None, mode="trilinear"
        )
        np.testing.assert_allclose(
            np.asarray(d.sum(axis=(1, 2, 3, 4))), [40.0, 40.0], rtol=1e-4
        )

    def test_grad(self):
        pts = jnp.asarray([[[0.1, 0.2, -0.1]]])
        feats = jnp.ones((1, 1, 1))
        dens = jnp.zeros((1, 1, 4, 4, 4))

        def loss(p):
            f, d = add_points_features_to_volume_densities_features(
                p, feats, dens, None, mode="trilinear"
            )
            return jnp.sum(d * jnp.arange(64.0).reshape(1, 1, 4, 4, 4))

        g = jax.grad(loss)(pts)
        assert np.abs(np.asarray(g)).sum() > 0


class TestCamerasAlignment:
    def test_extrinsics_identity(self):
        R, T = look_at_view_transform(dist=3.0, elev=20.0, azim=jnp.asarray([0.0, 40.0, 80.0]))
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        aligned = corresponding_cameras_alignment(
            cams, cams, estimate_scale=False, mode="extrinsics"
        )
        np.testing.assert_allclose(np.asarray(aligned.R), np.asarray(cams.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(aligned.T), np.asarray(cams.T), atol=1e-5)

    def test_centers_recovers_similarity(self):
        R, T = look_at_view_transform(
            dist=3.0, elev=10.0, azim=jnp.asarray([0.0, 30.0, 60.0, 90.0])
        )
        cams_src = FoVPerspectiveCameras.create(R=R, T=T)
        # build target by transforming the sources with a known similarity
        angle = 0.5
        A = np.asarray(
            [[np.cos(angle), -np.sin(angle), 0],
             [np.sin(angle), np.cos(angle), 0], [0, 0, 1]], np.float32,
        )
        s = 2.0
        t = np.asarray([1.0, -2.0, 0.5], np.float32)
        new_R = jnp.einsum("ij,njk->nik", jnp.asarray(A.T), cams_src.R)
        centers = cams_src.get_camera_center()
        new_centers = s * (centers @ jnp.asarray(A)) + t
        new_T = -jnp.einsum("ni,nij->nj", new_centers, new_R)
        cams_tgt = FoVPerspectiveCameras.create(R=new_R, T=new_T)
        aligned = corresponding_cameras_alignment(
            cams_src, cams_tgt, estimate_scale=True, mode="centers"
        )
        np.testing.assert_allclose(
            np.asarray(aligned.get_camera_center()),
            np.asarray(cams_tgt.get_camera_center()),
            atol=1e-3,
        )


class TestCubifyFeats:
    def test_atlas_colors_from_voxels(self):
        from pytorch3d_tpu.ops.cubify import cubify
        from pytorch3d_tpu.renderer.mesh.textures import TexturesAtlas

        # two occupied voxels with distinct colors
        vox = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0, 0].set(1.0).at[0, 1, 1, 1].set(1.0)
        feats = jnp.zeros((1, 3, 2, 2, 2))
        feats = feats.at[0, :, 0, 0, 0].set(jnp.asarray([1.0, 0.0, 0.0]))
        feats = feats.at[0, :, 1, 1, 1].set(jnp.asarray([0.0, 1.0, 0.0]))
        m = cubify(vox, 0.5, feats=feats, align="center")
        assert isinstance(m.textures, TexturesAtlas)
        atlas = m.textures.atlas_padded()  # (1, FCAP, 1, 1, 3)
        nf = int(m.num_faces_per_mesh()[0])
        assert nf == 24  # two isolated cubes, 12 tris each
        cols = np.asarray(atlas[0, :nf, 0, 0])
        reds = (cols == [1.0, 0.0, 0.0]).all(-1).sum()
        greens = (cols == [0.0, 1.0, 0.0]).all(-1).sum()
        assert reds == 12 and greens == 12
        # faces at padding have zero color
        assert np.allclose(np.asarray(atlas[0, nf:]), 0.0)

    def test_feats_ignored_unless_center(self):
        from pytorch3d_tpu.ops.cubify import cubify

        vox = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0, 0].set(1.0)
        feats = jnp.ones((1, 3, 2, 2, 2))
        m = cubify(vox, 0.5, feats=feats, align="topleft")
        assert m.textures is None  # reference only attaches for align="center"
