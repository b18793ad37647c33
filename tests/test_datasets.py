"""ShapeNetCore / R2N2 / glTF dataset-level tests on synthetic miniature
trees (reference tests/test_shapenet_core.py, test_r2n2.py, binvox utils)."""

import json
import os
import struct

import jax.numpy as jnp
import numpy as np

CUBE_OBJ = """
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
f 1 2 3
f 1 3 4
f 5 7 6
f 5 8 7
f 1 5 6
f 1 6 2
f 2 6 7
f 2 7 3
f 3 7 8
f 3 8 4
f 4 8 5
f 4 5 1
"""


def _make_shapenet(root):
    syn = "04379243"
    for model in ("model_a", "model_b"):
        d = os.path.join(root, syn, model)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "model.obj"), "w") as f:
            f.write(CUBE_OBJ)
    return syn


class TestShapeNetCore:
    def test_load_and_getitem(self, tmp_path):
        from pytorch3d_tpu.datasets import ShapeNetCore

        syn = _make_shapenet(str(tmp_path))
        ds = ShapeNetCore(str(tmp_path), version=1, load_textures=False)
        assert len(ds) == 2
        item = ds[0]
        assert item["synset_id"] == syn
        assert item["verts"].shape == (8, 3)
        assert item["faces"].shape == (12, 3)
        assert item["model_id"] == "model_a"

    def test_render(self, tmp_path):
        from pytorch3d_tpu.datasets import ShapeNetCore

        _make_shapenet(str(tmp_path))
        ds = ShapeNetCore(str(tmp_path), version=1, load_textures=False)
        images = ds.render(
            idxs=[0], image_size=32, dist=4.0, elev=20.0, azim=30.0
        )
        assert images.shape[0] == 1 and images.shape[1] == 32
        assert float((np.asarray(images[..., 3]) > 0).sum()) > 10


class TestBinvox:
    def _write_binvox(self, path, dim=8):
        # one filled voxel run at the start, rest empty (RLE pairs)
        total = dim**3
        with open(path, "wb") as f:
            f.write(b"#binvox 1\n")
            f.write(f"dim {dim} {dim} {dim}\n".encode())
            f.write(b"translate 0 0 0\n")
            f.write(b"scale 1\n")
            f.write(b"data\n")
            # 4 filled, then empty in chunks of <=255
            f.write(bytes([1, 4]))
            rest = total - 4
            while rest > 0:
                n = min(rest, 255)
                f.write(bytes([0, n]))
                rest -= n

    def test_read_binvox_coords(self, tmp_path):
        from pytorch3d_tpu.datasets.r2n2.utils import read_binvox_coords

        p = str(tmp_path / "m.binvox")
        self._write_binvox(p)
        with open(p, "rb") as f:
            coords = read_binvox_coords(f)
        assert coords.shape == (4, 3)


class TestGlbRoundTrip:
    def test_save_load(self, tmp_path):
        from pytorch3d_tpu.io import IO
        from pytorch3d_tpu.structures import Meshes

        verts = jnp.asarray(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        mesh = Meshes.create([verts], [faces])
        p = str(tmp_path / "m.glb")
        io = IO()
        io.save_mesh(mesh, p)
        assert os.path.getsize(p) > 0
        loaded = io.load_mesh(p)
        assert np.allclose(
            np.asarray(loaded.verts_padded()[0]), np.asarray(verts), atol=1e-6
        )
        lf = np.asarray(loaded.faces_padded()[0])
        assert np.array_equal(lf[: faces.shape[0]], np.asarray(faces))
