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


class TestR2N2:
    def _make_tree(self, root):
        syn = "04379243"
        shapenet = os.path.join(root, "shapenet")
        r2n2 = os.path.join(root, "r2n2")
        for model in ("m0", "m1"):
            d = os.path.join(shapenet, syn, model)
            os.makedirs(d)
            with open(os.path.join(d, "model.obj"), "w") as f:
                f.write(CUBE_OBJ)
            rdir = os.path.join(r2n2, "ShapeNetRendering", syn, model, "rendering")
            os.makedirs(rdir)
            from PIL import Image

            for v in range(2):
                Image.fromarray(
                    np.full((16, 16, 3), 40 * (v + 1), np.uint8)
                ).save(os.path.join(rdir, "%02d.png" % v))
            with open(os.path.join(rdir, "rendering_metadata.txt"), "w") as f:
                f.write("30 20 0 0.7 25\n60 10 0 0.8 25\n")
            vdir = os.path.join(r2n2, "ShapeNetVoxels", syn, model)
            os.makedirs(vdir)
            TestBinvox()._write_binvox(os.path.join(vdir, "model.binvox"))
        splits = os.path.join(root, "splits.json")
        with open(splits, "w") as f:
            json.dump({"train": {syn: {"m0": 0, "m1": 1}}, "test": {syn: {}}}, f)
        return shapenet, r2n2, splits, syn

    def test_getitem_views_and_voxels(self, tmp_path):
        from pytorch3d_tpu.datasets import R2N2

        shapenet, r2n2, splits, syn = self._make_tree(str(tmp_path))
        ds = R2N2(
            "train", shapenet, r2n2, splits,
            return_voxels=True, load_textures=False,
        )
        assert len(ds) == 2
        item = ds[0]
        assert item["verts"].shape == (8, 3)
        assert item["images"].shape == (2, 16, 16, 3)
        assert item["R"].shape == (2, 3, 3)
        assert item["K"].shape == (2, 4, 4)
        assert item["voxel_coords"].shape == (4, 3)
        # single-view fetch
        item1 = ds[(1, [1])]
        assert item1["images"].shape == (1, 16, 16, 3)
        assert abs(float(item1["images"][0, 0, 0, 0]) - 80 / 255) < 1e-3

    def test_collate(self, tmp_path):
        from pytorch3d_tpu.datasets import R2N2, collate_batched_R2N2

        shapenet, r2n2, splits, _ = self._make_tree(str(tmp_path))
        ds = R2N2("train", shapenet, r2n2, splits, load_textures=False)
        batch = collate_batched_R2N2([ds[0], ds[1]])
        assert batch["mesh"].verts_padded().shape[0] == 2
        assert batch["images"].shape[0] == 2
