"""Reference-parity batch 2: structures math and pure-torch ops
(mesh normals, cot laplacian, cubify, subdivision, FPS, barycentric
interpolation)."""

import sys

import numpy as np

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


def _ico(level):
    """Reference ico sphere + OUR Meshes built from the SAME verts/faces
    (the reference's subdivision ordering differs from ours, so structure
    comparisons run on shared geometry)."""
    from pytorch3d.utils import ico_sphere as ref_ico

    from pytorch3d_tpu.structures import Meshes

    ref_m = ref_ico(level)
    our_m = Meshes.create(
        [jnp.asarray(t2n(ref_m.verts_packed()))],
        [jnp.asarray(t2n(ref_m.faces_packed()).astype(np.int32))],
    )
    return ref_m, our_m


class TestStructuresParity:
    def test_ico_sphere_invariants(self):
        # tessellation ordering differs by design; the counts and the radius
        # invariant must agree
        from pytorch3d.utils import ico_sphere as ref_ico

        from pytorch3d_tpu.utils import ico_sphere as our_ico

        for level in (0, 1, 2):
            r = ref_ico(level)
            o = our_ico(level)
            assert int(o.num_verts_per_mesh()[0]) == r.verts_packed().shape[0]
            assert int(o.num_faces_per_mesh()[0]) == r.faces_packed().shape[0]
            rad = np.linalg.norm(np.asarray(o.verts_padded()[0]), axis=-1)
            np.testing.assert_allclose(rad, 1.0, atol=1e-5)

    def test_vertex_normals(self):
        ref_m, our_m = _ico(2)
        close(
            np.asarray(our_m.verts_normals_padded()[0]),
            t2n(ref_m.verts_normals_padded()[0]),
            rtol=1e-3,
            atol=1e-4,
        )

    def test_edge_count_and_set(self):
        ref_m, our_m = _ico(1)
        ref_edges = t2n(ref_m.edges_packed())
        n = int(our_m.num_edges())
        our_edges = np.asarray(our_m.edges_packed())[:n]
        assert n == ref_edges.shape[0]
        ref_set = {tuple(sorted(e)) for e in ref_edges.tolist()}
        our_set = {tuple(sorted(e)) for e in our_edges.tolist()}
        assert ref_set == our_set

    def test_cot_laplacian(self):
        from pytorch3d.ops import cot_laplacian as ref_fn

        from pytorch3d_tpu.ops import cot_laplacian as our_fn

        ref_m, our_m = _ico(1)
        Lr, iar = ref_fn(ref_m.verts_packed(), ref_m.faces_packed())
        Lo, iao = our_fn(our_m.verts_packed(), our_m.faces_packed())
        close(np.asarray(Lo.todense()), Lr.to_dense().numpy(), rtol=1e-3, atol=1e-4)
        close(iao, t2n(iar), rtol=1e-3, atol=1e-4)

    def test_uniform_laplacian(self):
        from pytorch3d.ops import laplacian as ref_fn

        from pytorch3d_tpu.ops import laplacian as our_fn

        ref_m, our_m = _ico(1)
        Lr = ref_fn(ref_m.verts_packed(), ref_m.edges_packed())
        n = int(our_m.num_edges())
        Lo = our_fn(our_m.verts_packed(), our_m.edges_packed()[:n])
        close(np.asarray(Lo.todense()), Lr.to_dense().numpy(), atol=1e-5)


class TestOpsParity2:
    def test_cubify(self):
        from pytorch3d.ops import cubify as ref_fn

        from pytorch3d_tpu.ops import cubify as our_fn

        vox = np.zeros((1, 4, 5, 6), np.float32)
        vox[0, 1, 2, 3] = 1.0
        vox[0, 1, 2, 4] = 1.0
        vox[0, 2, 2, 3] = 1.0
        ref_m = ref_fn(torch.tensor(vox), 0.5)
        our_m = our_fn(jnp.asarray(vox), 0.5)
        nv = int(our_m.num_verts_per_mesh()[0])
        nf = int(our_m.num_faces_per_mesh()[0])
        assert nv == ref_m.verts_list()[0].shape[0]
        assert nf == ref_m.faces_list()[0].shape[0]
        ref_v = np.unique(t2n(ref_m.verts_list()[0]).round(5), axis=0)
        our_v = np.unique(
            np.asarray(our_m.verts_padded()[0][:nv]).round(5), axis=0
        )
        close(our_v, ref_v, atol=1e-5)

    def test_subdivide(self):
        from pytorch3d.ops import SubdivideMeshes as RefSub

        from pytorch3d_tpu.ops import SubdivideMeshes as OurSub

        ref_m, our_m = _ico(1)
        ref_out = RefSub()(ref_m)
        our_out = OurSub()(our_m)
        nv = int(our_out.num_verts_per_mesh()[0])
        nf = int(our_out.num_faces_per_mesh()[0])
        assert nv == ref_out.verts_list()[0].shape[0]
        assert nf == ref_out.faces_list()[0].shape[0]
        ref_v = np.unique(t2n(ref_out.verts_list()[0]).round(5), axis=0)
        our_v = np.unique(
            np.asarray(our_out.verts_padded()[0][:nv]).round(5), axis=0
        )
        close(our_v, ref_v, atol=1e-5)

    def test_interpolate_face_attributes(self):
        from pytorch3d.ops.interp_face_attrs import (
            interpolate_face_attributes_python as ref_fn,
        )

        from pytorch3d_tpu.ops import interpolate_face_attributes as our_fn

        rng = np.random.RandomState(1)
        F, D = 6, 4
        pix = rng.randint(-1, F, (1, 3, 3, 2)).astype(np.int64)
        bary = rng.dirichlet((1, 1, 1), (1, 3, 3, 2)).astype(np.float32)
        attrs = rng.randn(F, 3, D).astype(np.float32)
        close(
            our_fn(jnp.asarray(pix), jnp.asarray(bary), jnp.asarray(attrs)),
            t2n(
                ref_fn(
                    torch.tensor(pix), torch.tensor(bary), torch.tensor(attrs)
                )
            ),
            atol=1e-5,
        )

    def test_vert_align(self):
        from pytorch3d.ops import vert_align as ref_fn

        from pytorch3d_tpu.ops import vert_align as our_fn

        rng = np.random.RandomState(2)
        feats = rng.randn(2, 5, 9, 9).astype(np.float32)
        verts = rng.uniform(-0.9, 0.9, (2, 7, 3)).astype(np.float32)
        close(
            our_fn(jnp.asarray(feats), jnp.asarray(verts)),
            t2n(ref_fn(torch.tensor(feats), torch.tensor(verts))),
            rtol=1e-3,
            atol=1e-4,
        )

    def test_taubin_smoothing(self):
        from pytorch3d.ops import taubin_smoothing as ref_fn

        from pytorch3d_tpu.ops import taubin_smoothing as our_fn

        ref_m, our_m = _ico(1)
        ref_out = ref_fn(ref_m, num_iter=3)
        our_out = our_fn(our_m, num_iter=3)
        close(
            np.asarray(our_out.verts_padded()[0]),
            t2n(ref_out.verts_padded()[0]),
            rtol=1e-3,
            atol=1e-4,
        )
