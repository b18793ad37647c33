"""Structures accessor sweep: random heterogeneous batches built in BOTH
libraries, every public accessor compared (reference structures/meshes.py,
structures/pointclouds.py).

Our packed views are static padded reshapes with validity masks (TPU
pytree design) while the reference's are compacted, so comparisons
compact ours through the masks and remap index-valued accessors from
padded-packed to compacted coordinates.
"""

import numpy as np
import pytest

import sys

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pytorch3d.structures import Meshes as RefMeshes  # noqa: E402
from pytorch3d.structures import Pointclouds as RefClouds  # noqa: E402

from pytorch3d_tpu.structures import (  # noqa: E402
    Meshes,
    Pointclouds,
)


def t2n(x):
    return x.detach().cpu().numpy()


def _random_batch(seed=7):
    rng = np.random.RandomState(seed)
    verts, faces = [], []
    for nv, nf in [(7, 9), (12, 16), (4, 2)]:
        v = rng.randn(nv, 3).astype(np.float32)
        f = rng.randint(0, nv, (nf, 3)).astype(np.int64)
        # avoid degenerate repeated-vertex faces for normals comparisons
        for r in range(nf):
            while len(set(f[r])) < 3:
                f[r] = rng.randint(0, nv, 3)
        verts.append(v)
        faces.append(f)
    return verts, faces


@pytest.fixture(scope="module")
def batches():
    verts, faces = _random_batch()
    ours = Meshes.create(
        [jnp.asarray(v) for v in verts], [jnp.asarray(f) for f in faces]
    )
    ref = RefMeshes(
        verts=[torch.from_numpy(v) for v in verts],
        faces=[torch.from_numpy(f) for f in faces],
    )
    return ours, ref


def _compact(x, mask):
    return np.asarray(x)[np.asarray(mask)]


def _remap(idx, mask):
    """Padded-packed index values -> compacted coordinates."""
    m = np.asarray(mask)
    new_index = np.cumsum(m) - 1
    out = np.where(np.asarray(idx) >= 0, new_index[np.asarray(idx)], -1)
    return out


class TestMeshesAccessorParity:
    def test_counts(self, batches):
        ours, ref = batches
        np.testing.assert_array_equal(
            np.asarray(ours.num_verts_per_mesh()), t2n(ref.num_verts_per_mesh())
        )
        np.testing.assert_array_equal(
            np.asarray(ours.num_faces_per_mesh()), t2n(ref.num_faces_per_mesh())
        )
        np.testing.assert_array_equal(
            np.asarray(ours.num_edges_per_mesh()), t2n(ref.num_edges_per_mesh())
        )

    def test_packed_verts_faces(self, batches):
        ours, ref = batches
        vm = ours.verts_packed_mask()
        fm = ours.faces_packed_mask()
        np.testing.assert_allclose(
            _compact(ours.verts_packed(), vm), t2n(ref.verts_packed())
        )
        np.testing.assert_array_equal(
            _remap(ours.faces_packed(), vm)[np.asarray(fm)],
            t2n(ref.faces_packed()),
        )
        np.testing.assert_array_equal(
            _compact(ours.verts_packed_to_mesh_idx(), vm),
            t2n(ref.verts_packed_to_mesh_idx()),
        )
        np.testing.assert_array_equal(
            _compact(ours.faces_packed_to_mesh_idx(), fm),
            t2n(ref.faces_packed_to_mesh_idx()),
        )

    def test_padded(self, batches):
        ours, ref = batches
        # padded shapes match (same max sizes) and valid regions agree
        ov, rv = np.asarray(ours.verts_padded()), t2n(ref.verts_padded())
        assert ov.shape == rv.shape
        for n, c in enumerate(t2n(ref.num_verts_per_mesh())):
            np.testing.assert_allclose(ov[n, :c], rv[n, :c])
        of, rf = np.asarray(ours.faces_padded()), t2n(ref.faces_padded())
        assert of.shape == rf.shape
        for n, c in enumerate(t2n(ref.num_faces_per_mesh())):
            np.testing.assert_array_equal(of[n, :c], rf[n, :c])
            assert (rf[n, c:] == -1).all() and (of[n, c:] == -1).all()

    def test_edges_per_mesh_sets(self, batches):
        ours, ref = batches
        em = ours.edges_packed_mask()
        our_edges = _remap(ours.edges_packed(), ours.verts_packed_mask())[
            np.asarray(em)
        ]
        ref_edges = t2n(ref.edges_packed())
        our_mesh_idx = _compact(ours.edges_packed_to_mesh_idx(), em)
        ref_mesh_idx = t2n(ref.edges_packed_to_mesh_idx())
        for n in range(3):
            a = {tuple(e) for e in our_edges[our_mesh_idx == n]}
            b = {tuple(e) for e in ref_edges[ref_mesh_idx == n]}
            assert a == b

    def test_faces_packed_to_edges_packed(self, batches):
        ours, ref = batches
        fm = np.asarray(ours.faces_packed_mask())
        em = ours.edges_packed_mask()
        # map both to actual edge endpoint pairs and compare those
        our_e2v = _remap(ours.edges_packed(), ours.verts_packed_mask())
        our_f2e = np.asarray(ours.faces_packed_to_edges_packed())[fm]
        ref_e2v = t2n(ref.edges_packed())
        ref_f2e = t2n(ref.faces_packed_to_edges_packed())
        np.testing.assert_array_equal(
            our_e2v[our_f2e], ref_e2v[ref_f2e]
        )

    def test_normals_and_areas(self, batches):
        ours, ref = batches
        fm = ours.faces_packed_mask()
        vm = ours.verts_packed_mask()
        # reference faces_areas_normals is a native op (stubbed in tests);
        # recompute the expectation with torch cross products
        fv = ref.verts_packed()[ref.faces_packed()]
        cross = torch.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0], dim=-1)
        ra = cross.norm(dim=-1) / 2.0
        rn = torch.nn.functional.normalize(cross, dim=-1)
        np.testing.assert_allclose(
            _compact(ours.faces_areas_packed(), fm), t2n(ra), atol=1e-6
        )
        got_n = _compact(ours.faces_normals_packed(), fm)
        want_n = t2n(rn)
        np.testing.assert_allclose(
            np.abs((got_n * want_n).sum(-1)), np.ones(len(want_n)), atol=1e-4
        )
        np.testing.assert_allclose(
            _compact(ours.verts_normals_packed(), vm),
            t2n(ref.verts_normals_packed()),
            atol=1e-5,
        )

    def test_lists_and_get_mesh(self, batches):
        ours, ref = batches
        for a, b in zip(ours.verts_list(), ref.verts_list()):
            np.testing.assert_allclose(np.asarray(a), t2n(b))
        for a, b in zip(ours.faces_list(), ref.faces_list()):
            np.testing.assert_array_equal(np.asarray(a), t2n(b))
        v, f = ours.get_mesh_verts_faces(1)
        rv, rf = ref.get_mesh_verts_faces(1)
        np.testing.assert_allclose(np.asarray(v), t2n(rv))
        np.testing.assert_array_equal(np.asarray(f), t2n(rf))

    def test_verts_padded_to_packed_idx(self, batches):
        ours, ref = batches
        vm = np.asarray(ours.verts_packed_mask())
        our_idx = np.asarray(ours.verts_padded_to_packed_idx())
        flat = np.asarray(ours.verts_padded()).reshape(-1, 3)
        ref_flat = t2n(ref.verts_padded()).reshape(-1, 3)
        np.testing.assert_allclose(
            flat[our_idx][vm] if our_idx.shape[0] == flat.shape[0]
            else flat[our_idx],
            ref_flat[t2n(ref.verts_padded_to_packed_idx())],
        )

    def test_transforms(self, batches):
        ours, ref = batches
        vm = ours.verts_packed_mask()
        off_np = np.random.RandomState(3).randn(3).astype(np.float32)
        o2 = ours.offset_verts(jnp.asarray(off_np))
        r2 = ref.offset_verts(
            torch.from_numpy(off_np).expand_as(ref.verts_packed())
        )
        np.testing.assert_allclose(
            _compact(o2.verts_packed(), vm), t2n(r2.verts_packed()), atol=1e-6
        )
        o3 = ours.scale_verts(2.5)
        r3 = ref.scale_verts(2.5)
        np.testing.assert_allclose(
            _compact(o3.verts_packed(), vm), t2n(r3.verts_packed()), atol=1e-6
        )
        new_padded = np.asarray(ours.verts_padded()) * 0.5 + 1.0
        o4 = ours.update_padded(jnp.asarray(new_padded))
        r4 = ref.update_padded(torch.from_numpy(t2n(ref.verts_padded()) * 0.5 + 1.0))
        np.testing.assert_allclose(
            _compact(o4.verts_packed(), vm), t2n(r4.verts_packed()), atol=1e-6
        )

    def test_extend_and_getitem(self, batches):
        ours, ref = batches
        oe, re = ours.extend(2), ref.extend(2)
        assert len(oe) == len(re) == 6
        np.testing.assert_array_equal(
            np.asarray(oe.num_verts_per_mesh()), t2n(re.num_verts_per_mesh())
        )
        np.testing.assert_allclose(
            np.asarray(oe[4].verts_list()[0]), t2n(re[4].verts_list()[0])
        )

    def test_bounding_boxes(self, batches):
        ours, ref = batches
        np.testing.assert_allclose(
            np.asarray(ours.get_bounding_boxes()),
            t2n(ref.get_bounding_boxes()),
            atol=1e-6,
        )

    def test_laplacian_packed(self, batches):
        ours, ref = batches
        vm = np.asarray(ours.verts_packed_mask())
        L_ref = t2n(ref.laplacian_packed().to_dense())
        L_ours = ours.laplacian_packed()
        if hasattr(L_ours, "todense"):
            L_ours = L_ours.todense()
        L_ours = np.asarray(L_ours)
        if L_ours.shape != L_ref.shape:
            L_ours = L_ours[np.ix_(vm, vm)]
        np.testing.assert_allclose(L_ours, L_ref, atol=1e-5)


@pytest.fixture(scope="module")
def cloud_batches():
    rng = np.random.RandomState(11)
    pts = [rng.randn(n, 3).astype(np.float32) for n in (9, 5, 14)]
    feats = [rng.rand(n, 4).astype(np.float32) for n in (9, 5, 14)]
    norms = [rng.randn(n, 3).astype(np.float32) for n in (9, 5, 14)]
    ours = Pointclouds.create(
        [jnp.asarray(p) for p in pts],
        normals=[jnp.asarray(n) for n in norms],
        features=[jnp.asarray(f) for f in feats],
    )
    ref = RefClouds(
        points=[torch.from_numpy(p) for p in pts],
        normals=[torch.from_numpy(n) for n in norms],
        features=[torch.from_numpy(f) for f in feats],
    )
    return ours, ref


class TestPointcloudsAccessorParity:
    def test_packed_and_counts(self, cloud_batches):
        ours, ref = cloud_batches
        pm = ours.points_packed_mask()
        np.testing.assert_array_equal(
            np.asarray(ours.num_points_per_cloud()),
            t2n(ref.num_points_per_cloud()),
        )
        np.testing.assert_allclose(
            _compact(ours.points_packed(), pm), t2n(ref.points_packed())
        )
        np.testing.assert_allclose(
            _compact(ours.normals_packed(), pm), t2n(ref.normals_packed())
        )
        np.testing.assert_allclose(
            _compact(ours.features_packed(), pm), t2n(ref.features_packed())
        )
        np.testing.assert_array_equal(
            _compact(ours.packed_to_cloud_idx(), pm),
            t2n(ref.packed_to_cloud_idx()),
        )

    def test_lists(self, cloud_batches):
        ours, ref = cloud_batches
        for a, b in zip(ours.points_list(), ref.points_list()):
            np.testing.assert_allclose(np.asarray(a), t2n(b))
        for a, b in zip(ours.features_list(), ref.features_list()):
            np.testing.assert_allclose(np.asarray(a), t2n(b))

    def test_transforms_and_boxes(self, cloud_batches):
        ours, ref = cloud_batches
        pm = ours.points_packed_mask()
        o2, r2 = ours.scale(3.0), ref.clone().scale_(3.0)
        np.testing.assert_allclose(
            _compact(o2.points_packed(), pm), t2n(r2.points_packed()),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ours.get_bounding_boxes()),
            t2n(ref.get_bounding_boxes()),
            atol=1e-5,
        )

    def test_inside_box(self, cloud_batches):
        ours, ref = cloud_batches
        box = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        got = np.asarray(ours.inside_box(jnp.asarray(box)))
        want = t2n(ref.inside_box(torch.from_numpy(box)))
        pm = np.asarray(ours.points_packed_mask())
        if got.shape != want.shape:
            got = got[pm]
        np.testing.assert_array_equal(got.astype(bool), want.astype(bool))

    def test_split_and_extend(self, cloud_batches):
        ours, ref = cloud_batches
        os_, rs = ours.split([1, 2]), ref.split([1, 2])
        assert len(os_) == len(rs) == 2
        np.testing.assert_allclose(
            np.asarray(os_[1].points_list()[0]), t2n(rs[1].points_list()[0])
        )
        oe, re = ours.extend(3), ref.extend(3)
        np.testing.assert_array_equal(
            np.asarray(oe.num_points_per_cloud()),
            t2n(re.num_points_per_cloud()),
        )
