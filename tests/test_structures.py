import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.structures import (
    Meshes,
    Pointclouds,
    Volumes,
    join_meshes_as_batch,
    join_meshes_as_scene,
    join_pointclouds_as_batch,
    join_pointclouds_as_scene,
    list_to_packed,
    list_to_padded,
    packed_to_list,
    padded_to_list,
)
from pytorch3d_tpu.utils import ico_sphere, torus


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def two_meshes():
    # mesh 0: single triangle; mesh 1: quad (two triangles)
    verts0 = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces0 = jnp.array([[0, 1, 2]])
    verts1 = jnp.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    faces1 = jnp.array([[0, 1, 2], [0, 2, 3]])
    return Meshes.create(verts=[verts0, verts1], faces=[faces0, faces1])


class TestStructUtils:
    def test_list_to_padded_roundtrip(self):
        x = [jnp.ones((2, 3)), jnp.ones((4, 3)) * 2]
        padded = list_to_padded(x)
        assert padded.shape == (2, 4, 3)
        back = padded_to_list(padded, split_size=[2, 4])
        for a, b in zip(back, x):
            assert_close(a, b)

    def test_list_to_packed(self):
        x = [jnp.ones((2, 3)), jnp.ones((3, 3)) * 2]
        packed, num, first, to_list = list_to_packed(x)
        assert packed.shape == (5, 3)
        assert_close(num, jnp.array([2, 3]))
        assert_close(first, jnp.array([0, 2]))
        assert_close(to_list, jnp.array([0, 0, 1, 1, 1]))
        back = packed_to_list(packed, [2, 3])
        assert_close(back[1], x[1])


class TestMeshes:
    def test_basic_shapes(self):
        m = two_meshes()
        assert len(m) == 2
        assert m.max_verts == 4 and m.max_faces == 2
        assert_close(m.num_verts_per_mesh(), jnp.array([3, 4]))
        assert_close(m.num_faces_per_mesh(), jnp.array([1, 2]))

    def test_packed_views(self):
        m = two_meshes()
        vp = m.verts_packed()
        assert vp.shape == (8, 3)
        fp = m.faces_packed()
        # mesh 1 faces offset by V=4
        assert_close(fp[2], jnp.array([4, 5, 6]))
        assert_close(m.faces_packed_mask(), jnp.array([True, False, True, True]))
        assert_close(
            m.verts_packed_mask(),
            jnp.array([1, 1, 1, 0, 1, 1, 1, 1], bool),
        )

    def test_edges(self):
        m = two_meshes()
        edges = m.edges_packed()
        mask = m.edges_packed_mask()
        n_edges = int(m.num_edges())
        # mesh0: 3 edges; mesh1 quad: 5 unique edges
        assert n_edges == 8
        valid_edges = np.asarray(edges)[np.asarray(mask)]
        # all edges sorted (min, max), global ids
        assert (valid_edges[:, 0] < valid_edges[:, 1]).all()
        # mesh0 edges use ids < 4, mesh1 edges ids >= 4
        assert ((valid_edges < 4).all(axis=1) | (valid_edges >= 4).all(axis=1)).all()
        assert_close(m.num_edges_per_mesh(), jnp.array([3, 5]))

    def test_faces_to_edges(self):
        m = two_meshes()
        f2e = m.faces_packed_to_edges_packed()
        edges = m.edges_packed()
        faces = m.faces_packed()
        # column 0 should be the edge (v1, v2) of each face
        for fi in range(4):
            if not bool(m.faces_packed_mask()[fi]):
                continue
            e = edges[f2e[fi, 0]]
            expect = sorted([int(faces[fi, 1]), int(faces[fi, 2])])
            assert [int(e[0]), int(e[1])] == expect

    def test_normals_areas(self):
        m = two_meshes()
        areas = m.faces_areas_packed()
        assert_close(areas, jnp.array([0.5, 0.0, 0.5, 0.5]))
        normals = m.faces_normals_packed()
        assert_close(normals[0], jnp.array([0.0, 0, 1]))
        vn = m.verts_normals_packed()
        assert_close(vn[0], jnp.array([0.0, 0, 1]))

    def test_update_offset_scale(self):
        m = two_meshes()
        m2 = m.offset_verts(jnp.array([1.0, 0, 0]))
        assert_close(m2.verts_packed()[0], jnp.array([1.0, 0, 0]))
        m3 = m.scale_verts(2.0)
        assert_close(m3.verts_padded(), m.verts_padded() * 2)

    def test_getitem_extend(self):
        m = two_meshes()
        m0 = m[0]
        assert len(m0) == 1
        assert int(m0.num_faces_per_mesh()[0]) == 1
        me = m.extend(2)
        assert len(me) == 4
        assert_close(me.num_verts_per_mesh(), jnp.array([3, 3, 4, 4]))

    def test_join_as_batch_scene(self):
        m = two_meshes()
        j = join_meshes_as_batch([m[0], m[1]])
        assert len(j) == 2
        assert_close(j.num_verts_per_mesh(), m.num_verts_per_mesh())
        s = join_meshes_as_scene(m)
        assert len(s) == 1
        assert int(s.num_faces_per_mesh()[0]) == 3
        fp = s.faces_padded()[0][:3]
        # all face indices valid and the two sub-meshes don't share verts
        assert (np.asarray(fp) >= 0).all()

    def test_bounding_boxes(self):
        m = two_meshes()
        bb = m.get_bounding_boxes()
        assert bb.shape == (2, 3, 2)
        assert_close(bb[0, :, 0], jnp.zeros(3))
        assert_close(bb[0, 0, 1], 1.0)

    def test_jit_and_grad(self):
        m = two_meshes()

        @jax.jit
        def total_area(meshes):
            return meshes.faces_areas_packed().sum()

        assert_close(total_area(m), 1.5)

        def loss(verts_padded):
            m2 = m.update_padded(verts_padded)
            return m2.faces_areas_packed().sum()

        g = jax.grad(loss)(m.verts_padded())
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_ico_sphere(self):
        m = ico_sphere(2)
        v = m.verts_packed()
        assert int(m.num_faces_per_mesh()[0]) == 320
        assert_close(jnp.linalg.norm(v, axis=1), jnp.ones(v.shape[0]), atol=1e-5)
        # closed manifold: E = 3F/2
        assert int(m.num_edges()) == 480

    def test_torus(self):
        m = torus(0.5, 2.0, 8, 12)
        assert int(m.num_verts_per_mesh()[0]) == 96
        assert int(m.num_faces_per_mesh()[0]) == 192
        # closed manifold
        assert int(m.num_edges()) == 288


class TestPointclouds:
    def test_basic(self):
        p = Pointclouds.create(
            points=[jnp.zeros((3, 3)), jnp.ones((5, 3))],
            features=[jnp.ones((3, 2)), jnp.zeros((5, 2))],
        )
        assert len(p) == 2
        assert p.points_padded().shape == (2, 5, 3)
        assert p.features_packed().shape == (10, 2)
        assert_close(p.num_points_per_cloud(), jnp.array([3, 5]))

    def test_subsample(self):
        p = Pointclouds.create(points=[jnp.arange(30.0).reshape(10, 3)])
        p2 = p.subsample(4, key=jax.random.PRNGKey(0))
        assert p2.points_padded().shape == (1, 4, 3)
        assert int(p2.num_points_per_cloud()[0]) == 4

    def test_inside_box(self):
        p = Pointclouds.create(points=[jnp.array([[0.5, 0.5, 0.5], [2.0, 0, 0]])])
        box = jnp.array([[0.0, 0, 0], [1, 1, 1]])
        inside = p.inside_box(box)
        assert_close(inside, jnp.array([True, False]))

    def test_join(self):
        p = Pointclouds.create(points=[jnp.zeros((3, 3)), jnp.ones((5, 3))])
        s = join_pointclouds_as_scene(p)
        assert len(s) == 1
        assert int(s.num_points_per_cloud()[0]) == 8
        b = join_pointclouds_as_batch([p[0], p[1]])
        assert len(b) == 2


class TestVolumes:
    def test_coord_transforms(self):
        dens = jnp.zeros((2, 1, 4, 6, 8))  # D=4 H=6 W=8
        v = Volumes.create(dens, voxel_size=2.0, volume_translation=(1.0, 0, 0))
        # local (1,1,1) -> world: ((8-1, 6-1, 4-1) * 0.5 * 2) - (1,0,0)
        local = jnp.array([[1.0, 1.0, 1.0]])
        world = v.local_to_world_coords(local[None])[0]
        assert_close(world, jnp.array([[6.0, 5.0, 3.0]]))
        back = v.world_to_local_coords(world[None])[0]
        assert_close(back, local, atol=1e-5)

    def test_coord_grid(self):
        dens = jnp.zeros((1, 1, 2, 2, 2))
        v = Volumes.create(dens, voxel_size=1.0)
        grid = v.get_coord_grid(world_coordinates=True)
        assert grid.shape == (1, 2, 2, 2, 3)
        assert_close(grid[0, 0, 0, 0], jnp.array([-0.5, -0.5, -0.5]))
        assert_close(grid[0, 1, 1, 1], jnp.array([0.5, 0.5, 0.5]))


class TestListAccessors:
    """The reference's list-representation API surface
    (meshes.py:404-470, pointclouds.py:370-460, volumes.py:398-406)."""

    def _meshes(self):
        from pytorch3d_tpu.structures import Meshes

        v1 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
        f1 = np.array([[0, 1, 2], [1, 2, 3]], np.int64)
        v2 = np.random.RandomState(1).randn(5, 3).astype(np.float32)
        f2 = np.array([[0, 1, 2], [2, 3, 4], [0, 2, 4]], np.int64)
        return Meshes.create([v1, v2], [f1, f2]), (v1, f1, v2, f2)

    def test_meshes_lists(self):
        m, (v1, f1, v2, f2) = self._meshes()
        vl, fl = m.verts_list(), m.faces_list()
        assert len(vl) == 2 and vl[0].shape == (4, 3) and vl[1].shape == (5, 3)
        np.testing.assert_allclose(vl[0], v1)
        np.testing.assert_array_equal(fl[1], f2)
        nv = m.verts_normals_list()
        nf = m.faces_normals_list()
        assert nv[0].shape == (4, 3) and nf[1].shape == (3, 3)

    def test_meshes_get_and_split(self):
        m, (v1, f1, v2, f2) = self._meshes()
        gv, gf = m.get_mesh_verts_faces(1)
        np.testing.assert_allclose(gv, v2)
        np.testing.assert_array_equal(gf, f2)
        a, b = m.split([1, 1])
        assert len(a) == 1 and len(b) == 1
        np.testing.assert_allclose(a.verts_list()[0], v1)
        with pytest.raises(ValueError):
            m.split([1, 2])

    def test_meshes_edges_first_idx_and_laplacian(self):
        m, _ = self._meshes()
        first = np.asarray(m.mesh_to_edges_packed_first_idx())
        num = np.asarray(m.num_edges_per_mesh())
        assert first[0] == 0 and first[1] == num[0]
        L = m.laplacian_packed()
        nv = m.verts_packed().shape[0]
        assert L.shape == (nv, nv)
        # rows of a valid vertex sum to ~0 (uniform laplacian property)
        dense = np.asarray(L.todense())
        row_sums = np.abs(dense[:4].sum(axis=1))
        np.testing.assert_allclose(row_sums, 0.0, atol=1e-6)

    def test_meshes_underscore_and_shims(self):
        m, _ = self._meshes()
        m2 = m.offset_verts_(jnp.ones(3))
        assert m2 is not m
        np.testing.assert_allclose(
            np.asarray(m2.verts_list()[0]),
            np.asarray(m.verts_list()[0]) + 1.0,
            rtol=1e-6,
        )
        m3 = m.scale_verts_(2.0)
        np.testing.assert_allclose(
            np.asarray(m3.verts_list()[1]),
            np.asarray(m.verts_list()[1]) * 2.0,
            rtol=1e-6,
        )
        assert m.cpu() is m and m.cuda() is m
        assert m.check_shapes()
        idx = np.asarray(m.verts_padded_to_packed_idx())
        assert idx.shape == (m.verts_packed().shape[0],)

    def test_pointclouds_lists_and_split(self):
        from pytorch3d_tpu.structures import Pointclouds

        p1 = np.random.RandomState(2).randn(6, 3).astype(np.float32)
        p2 = np.random.RandomState(3).randn(4, 3).astype(np.float32)
        feats = [np.ones((6, 2), np.float32), np.zeros((4, 2), np.float32)]
        pc = Pointclouds.create([p1, p2], features=feats)
        pl = pc.points_list()
        np.testing.assert_allclose(pl[1], p2)
        fl = pc.features_list()
        assert fl[0].shape == (6, 2) and float(fl[0].sum()) == 12.0
        assert pc.normals_list() is None
        a, b = pc.split([1, 1])
        assert len(a) == 1
        pc2 = pc.offset_(jnp.ones(3))
        np.testing.assert_allclose(
            np.asarray(pc2.points_list()[0]), p1 + 1.0, rtol=1e-6
        )
        pc3 = pc.scale_(3.0)
        np.testing.assert_allclose(
            np.asarray(pc3.points_list()[1]), p2 * 3.0, rtol=1e-5
        )
        assert pc.cpu() is pc and pc.cuda() is pc
        idx = np.asarray(pc.padded_to_packed_idx())
        assert idx.shape == (pc.points_packed().shape[0],)

    def test_volumes_lists(self):
        from pytorch3d_tpu.structures import Volumes

        dens = np.random.RandomState(4).rand(2, 1, 3, 4, 5).astype(np.float32)
        feats = np.random.RandomState(5).rand(2, 2, 3, 4, 5).astype(np.float32)
        v = Volumes.create(densities=jnp.asarray(dens), features=jnp.asarray(feats))
        dl = v.densities_list()
        assert len(dl) == 2 and dl[0].shape == (1, 3, 4, 5)
        np.testing.assert_allclose(dl[1], dens[1])
        fl = v.features_list()
        assert fl[0].shape == (2, 3, 4, 5)
        assert v.cpu() is v and v.cuda() is v
