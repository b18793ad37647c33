"""IO parity: load the SAME files with the reference's pure-python
loaders (pytorch3d.io.load_obj / load_ply) and ours, compare arrays.
Complements test_io.py's scenario tests with direct cross-validation."""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402 (unused but keeps torch initialized first)

import jax.numpy as jnp  # noqa: E402,F401


def t2n(x):
    return x.detach().cpu().numpy()


OBJ_TEXT = """
# test cube-ish mesh with uvs, normals, and two materials
mtllib test.mtl
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
v 0.5 0.5 1.0
vt 0.1 0.1
vt 0.9 0.1
vt 0.9 0.9
vt 0.1 0.9
vn 0.0 0.0 1.0
vn 0.0 0.0 -1.0
usemtl mat_a
f 1/1/1 2/2/1 3/3/1
f 1/1/1 3/3/1 4/4/1
usemtl mat_b
f 1/1/2 2/2/2 5/1/2
f 2/2/2 3/3/2 5/2/2
"""

MTL_TEXT = """
newmtl mat_a
Kd 0.5 0.1 0.1
Ka 0.2 0.2 0.2
Ks 0.9 0.9 0.9
Ns 10.0
newmtl mat_b
Kd 0.1 0.5 0.1
"""

PLY_ASCII = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 1
3 0 1 2
3 0 2 3
"""


class TestObjParity:
    def _write(self, d):
        obj = os.path.join(d, "test.obj")
        with open(obj, "w") as f:
            f.write(OBJ_TEXT)
        with open(os.path.join(d, "test.mtl"), "w") as f:
            f.write(MTL_TEXT)
        return obj

    def test_load_obj_matches_reference(self):
        from pytorch3d.io import load_obj as ref_load_obj

        from pytorch3d_tpu.io import load_obj

        with tempfile.TemporaryDirectory() as d:
            obj = self._write(d)
            rv, rf, raux = ref_load_obj(obj, load_textures=False)
            ov, of, oaux = load_obj(obj, load_textures=False)

            np.testing.assert_allclose(np.asarray(ov), t2n(rv))
            np.testing.assert_array_equal(
                np.asarray(of.verts_idx), t2n(rf.verts_idx)
            )
            np.testing.assert_array_equal(
                np.asarray(of.textures_idx), t2n(rf.textures_idx)
            )
            np.testing.assert_array_equal(
                np.asarray(of.normals_idx), t2n(rf.normals_idx)
            )
            np.testing.assert_allclose(
                np.asarray(oaux.verts_uvs), t2n(raux.verts_uvs)
            )
            np.testing.assert_allclose(
                np.asarray(oaux.normals), t2n(raux.normals)
            )
            # per-face material assignment order
            np.testing.assert_array_equal(
                np.asarray(of.materials_idx), t2n(rf.materials_idx)
            )

    def test_load_obj_materials_match_reference(self):
        from pytorch3d.io import load_obj as ref_load_obj

        from pytorch3d_tpu.io import load_obj

        with tempfile.TemporaryDirectory() as d:
            obj = self._write(d)
            _, _, raux = ref_load_obj(obj, load_textures=True, device="cpu")
            _, _, oaux = load_obj(obj, load_textures=True)
            assert set(oaux.material_colors) == set(raux.material_colors)
            for name, props in raux.material_colors.items():
                for k, val in props.items():
                    np.testing.assert_allclose(
                        np.asarray(oaux.material_colors[name][k]),
                        t2n(val),
                        err_msg=f"{name}.{k}",
                    )

    def test_save_obj_reference_loads_it(self):
        # our writer -> reference loader round trip
        from pytorch3d.io import load_obj as ref_load_obj

        from pytorch3d_tpu.io import save_obj

        verts = jnp.asarray(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "out.obj")
            save_obj(path, verts, faces)
            rv, rf, _ = ref_load_obj(path, load_textures=False)
            np.testing.assert_allclose(t2n(rv), np.asarray(verts))
            np.testing.assert_array_equal(
                t2n(rf.verts_idx), np.asarray(faces)
            )


class TestPlyParity:
    def test_load_ply_ascii_matches_reference(self):
        from pytorch3d.io import load_ply as ref_load_ply

        from pytorch3d_tpu.io import load_ply

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t.ply")
            with open(path, "w") as f:
                f.write(PLY_ASCII)
            rv, rf = ref_load_ply(path)
            ov, of = load_ply(path)
            np.testing.assert_allclose(np.asarray(ov), t2n(rv))
            np.testing.assert_array_equal(np.asarray(of), t2n(rf))

    def test_save_ply_reference_loads_it(self):
        from pytorch3d.io import load_ply as ref_load_ply

        from pytorch3d_tpu.io import save_ply

        rng = np.random.RandomState(0)
        verts = jnp.asarray(rng.rand(7, 3).astype(np.float32))
        faces = jnp.asarray(
            [[0, 1, 2], [2, 3, 4], [4, 5, 6]], jnp.int32
        )
        for ascii_mode in (True, False):
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "t.ply")
                save_ply(path, verts, faces, ascii=ascii_mode)
                rv, rf = ref_load_ply(path)
                # ascii mode rounds to 6 decimal places by design
                atol = 1e-6 if ascii_mode else 0.0
                np.testing.assert_allclose(
                    t2n(rv), np.asarray(verts), rtol=1e-5, atol=atol
                )
                np.testing.assert_array_equal(t2n(rf), np.asarray(faces))


class TestSaveObjNormals:
    """save_obj with vn normals + stream output (reference obj_io.py:688
    normals/faces_normals_idx kwargs); round-trip through the REFERENCE
    loader proves format compatibility."""

    def test_normals_roundtrip_through_reference(self, tmp_path):
        import torch
        from pytorch3d.io import load_obj as ref_load_obj

        from pytorch3d_tpu.io import save_obj

        rng = np.random.RandomState(0)
        verts = rng.randn(5, 3).astype(np.float32)
        faces = np.array([[0, 1, 2], [2, 3, 4]], np.int64)
        normals = rng.randn(4, 3).astype(np.float32)
        fni = np.array([[0, 1, 2], [1, 2, 3]], np.int64)
        path = str(tmp_path / "n.obj")
        save_obj(
            path,
            verts,
            faces,
            normals=jnp.asarray(normals),
            faces_normals_idx=jnp.asarray(fni),
        )
        rv, rf, raux = ref_load_obj(path, load_textures=False)
        np.testing.assert_allclose(rv.numpy(), verts, atol=1e-5)
        np.testing.assert_array_equal(rf.verts_idx.numpy(), faces)
        np.testing.assert_allclose(raux.normals.numpy(), normals, atol=1e-5)
        np.testing.assert_array_equal(rf.normals_idx.numpy(), fni)

    def test_normals_roundtrip_through_ours(self, tmp_path):
        from pytorch3d_tpu.io import load_obj, save_obj

        rng = np.random.RandomState(1)
        verts = rng.randn(4, 3).astype(np.float32)
        faces = np.array([[0, 1, 2], [1, 2, 3]], np.int64)
        normals = rng.randn(3, 3).astype(np.float32)
        fni = np.array([[0, 0, 1], [1, 2, 2]], np.int64)
        path = str(tmp_path / "n2.obj")
        save_obj(path, verts, faces, normals=normals, faces_normals_idx=fni)
        v, f, aux = load_obj(path, load_textures=False)
        np.testing.assert_allclose(np.asarray(v), verts, atol=1e-5)
        np.testing.assert_allclose(np.asarray(aux.normals), normals, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(f.normals_idx), fni)

    def test_stream_output(self, tmp_path):
        import io as _io

        from pytorch3d_tpu.io import save_obj

        buf = _io.StringIO()
        save_obj(buf, np.eye(3, dtype=np.float32), np.array([[0, 1, 2]]))
        text = buf.getvalue()
        assert text.startswith("v ") and "\nf 1 2 3\n" in text

    def test_normals_mismatch_raises(self, tmp_path):
        from pytorch3d_tpu.io import save_obj

        with pytest.raises(ValueError):
            save_obj(
                str(tmp_path / "x.obj"),
                np.eye(3, dtype=np.float32),
                np.array([[0, 1, 2]]),
                normals=np.eye(3, dtype=np.float32),
            )


class TestTextureAtlasParity:
    """Bake parity for the SoftRas per-face atlas (reference mtl_io.py:24/:140)."""

    def test_make_material_atlas_matches(self):
        from pytorch3d.io.mtl_io import make_material_atlas as ref_mma

        from pytorch3d_tpu.io.mtl_io import make_material_atlas as our_mma

        rng = np.random.RandomState(0)
        img = rng.rand(37, 53, 3).astype(np.float32)
        uvs = rng.rand(40, 3, 2).astype(np.float32)
        for R in (1, 2, 4, 8):
            ref = ref_mma(torch.from_numpy(img), torch.from_numpy(uvs), R)
            ours = our_mma(img, uvs, R)
            np.testing.assert_allclose(t2n(ref), np.asarray(ours), atol=1e-5)

    def test_make_mesh_texture_atlas_matches(self):
        from pytorch3d.io.mtl_io import make_mesh_texture_atlas as ref_mmta

        from pytorch3d_tpu.io.mtl_io import (
            make_mesh_texture_atlas as our_mmta,
        )

        rng = np.random.RandomState(1)
        F = 30
        face_mat_names = np.array(["matA"] * 10 + ["matB"] * 10 + [""] * 10)
        faces_uvs = rng.randint(0, 20, (F, 3)).astype(np.int64)
        verts_uvs = rng.rand(20, 2).astype(np.float32)
        props = {
            "matA": {"diffuse_color": torch.tensor([0.2, 0.4, 0.6])},
            "matB": {},
        }
        tex_imgs = {
            "matB": torch.from_numpy(rng.rand(25, 31, 4).astype(np.float32))
        }
        ref = ref_mmta(
            props, dict(tex_imgs), face_mat_names,
            torch.from_numpy(faces_uvs), torch.from_numpy(verts_uvs),
            6, "repeat",
        )
        fmi = np.array([0] * 10 + [1] * 10 + [-1] * 10)
        our_props = {
            "matA": {"diffuse_color": np.array([0.2, 0.4, 0.6], np.float32)},
            "matB": {},
        }
        our_imgs = {"matB": np.asarray(tex_imgs["matB"])}
        ours = our_mmta(
            our_props, our_imgs, ["matA", "matB"], fmi, verts_uvs,
            faces_uvs, 6, "repeat",
        )
        np.testing.assert_allclose(t2n(ref), np.asarray(ours), atol=1e-5)

    def test_bake_sample_roundtrip_consistent(self):
        """A face whose uvs span a constant-color image region must sample
        back that color through TexturesAtlas — bake and lookup must share
        the subtriangle parametrization."""
        from pytorch3d_tpu.io.mtl_io import make_material_atlas as our_mma

        img = np.zeros((16, 16, 3), np.float32)
        img[:, :8] = [1.0, 0.0, 0.0]
        img[:, 8:] = [0.0, 1.0, 0.0]
        uvs = np.array([[[0.0, 0.0], [0.4, 0.0], [0.0, 0.4]]], np.float32)
        atlas = np.asarray(our_mma(img, uvs, 8))
        np.testing.assert_allclose(
            atlas.reshape(-1, 3), np.tile([[1.0, 0.0, 0.0]], (64, 1)),
            atol=1e-6,
        )
