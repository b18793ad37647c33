"""IO tests: obj/mtl round trips, ply ascii+binary, off, pluggable IO
(reference tests/test_obj_io.py, test_ply_io.py, test_off_io.py)."""

import os
import tempfile
from io import StringIO

import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.io import (
    IO,
    load_obj,
    load_objs_as_meshes,
    load_off,
    load_ply,
    save_obj,
    save_off,
    save_ply,
)
from pytorch3d_tpu.structures import Meshes, Pointclouds
from pytorch3d_tpu.utils import ico_sphere


class TestObjIO:
    def test_load_simple(self):
        obj = StringIO(
            "# comment\n"
            "v 0.1 0.2 0.3\nv 0.2 0.3 0.4\nv 0.3 0.4 0.5\nv 0.4 0.5 0.6\n"
            "f 1 2 3\nf 1 2 4\n"
        )
        verts, faces, aux = load_obj(obj)
        assert verts.shape == (4, 3)
        np.testing.assert_array_equal(
            np.asarray(faces.verts_idx), [[0, 1, 2], [0, 1, 3]]
        )

    def test_load_normals_uvs(self):
        obj = StringIO(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vt 0.1 0.2\nvt 0.3 0.4\nvt 0.5 0.6\n"
            "vn 0 0 1\n"
            "f 1/1/1 2/2/1 3/3/1\n"
        )
        verts, faces, aux = load_obj(obj)
        assert aux.verts_uvs.shape == (3, 2)
        assert aux.normals.shape == (1, 3)
        np.testing.assert_array_equal(np.asarray(faces.textures_idx), [[0, 1, 2]])
        np.testing.assert_array_equal(np.asarray(faces.normals_idx), [[0, 0, 0]])

    def test_quad_triangulation(self):
        obj = StringIO(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
        )
        verts, faces, _ = load_obj(obj)
        np.testing.assert_array_equal(
            np.asarray(faces.verts_idx), [[0, 1, 2], [0, 2, 3]]
        )

    def test_negative_indices(self):
        obj = StringIO("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        _, faces, _ = load_obj(obj)
        np.testing.assert_array_equal(np.asarray(faces.verts_idx), [[0, 1, 2]])

    def test_round_trip(self):
        m = ico_sphere(1)
        nv = int(m.num_verts_per_mesh()[0])
        nf = int(m.num_faces_per_mesh()[0])
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "sphere.obj")
            save_obj(path, m.verts_padded()[0][:nv], m.faces_padded()[0][:nf])
            verts, faces, _ = load_obj(path)
            np.testing.assert_allclose(
                np.asarray(verts), np.asarray(m.verts_padded()[0][:nv]),
                atol=1e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(faces.verts_idx),
                np.asarray(m.faces_padded()[0][:nf]),
            )

    def test_mtl_texture(self):
        with tempfile.TemporaryDirectory() as d:
            from PIL import Image

            img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(d, "tex.png"))
            with open(os.path.join(d, "mesh.mtl"), "w") as f:
                f.write("newmtl mat0\nKd 0.5 0.6 0.7\nmap_Kd tex.png\n")
            with open(os.path.join(d, "mesh.obj"), "w") as f:
                f.write(
                    "mtllib mesh.mtl\nusemtl mat0\n"
                    "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                    "vt 0 0\nvt 1 0\nvt 0 1\n"
                    "f 1/1 2/2 3/3\n"
                )
            verts, faces, aux = load_obj(
                os.path.join(d, "mesh.obj"), create_texture_atlas=True
            )
            assert "mat0" in aux.texture_images
            assert aux.texture_images["mat0"].shape == (8, 8, 3)
            assert aux.texture_atlas.shape == (1, 4, 4, 3)
            mesh = load_objs_as_meshes([os.path.join(d, "mesh.obj")])
            assert mesh.textures is not None


class TestPlyIO:
    def _mesh(self):
        m = ico_sphere(1)
        nv = int(m.num_verts_per_mesh()[0])
        nf = int(m.num_faces_per_mesh()[0])
        return (
            np.asarray(m.verts_padded()[0][:nv]),
            np.asarray(m.faces_padded()[0][:nf]),
        )

    def test_round_trip_binary(self):
        v, f = self._mesh()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "m.ply")
            save_ply(path, v, f)
            v2, f2 = load_ply(path)
            np.testing.assert_allclose(np.asarray(v2), v, atol=1e-6)
            np.testing.assert_array_equal(np.asarray(f2), f)

    def test_round_trip_ascii(self):
        v, f = self._mesh()
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "m.ply")
            save_ply(path, v, f, ascii=True)
            v2, f2 = load_ply(path)
            np.testing.assert_allclose(np.asarray(v2), v, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(f2), f)

    def test_round_trip_stream(self):
        # reference save_ply writes to open binary streams too
        import io as _io

        v, f = self._mesh()
        buf = _io.BytesIO()
        save_ply(buf, v, f)
        buf.seek(0)
        v2, f2 = load_ply(buf)
        np.testing.assert_allclose(np.asarray(v2), v, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(f2), f)

    def test_pointcloud_with_colors(self):
        pts = np.random.RandomState(1).rand(20, 3).astype(np.float32)
        cols = np.random.RandomState(2).rand(20, 3).astype(np.float32)
        pc = Pointclouds.create(jnp.asarray(pts[None]), features=jnp.asarray(cols[None]))
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "pc.ply")
            io = IO()
            io.save_pointcloud(pc, path)
            pc2 = io.load_pointcloud(path)
            np.testing.assert_allclose(
                np.asarray(pc2.points_padded()[0]), pts, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(pc2.features_padded()[0]), cols, atol=2e-2
            )


class TestOffIO:
    def test_round_trip(self):
        m = ico_sphere(0)
        nv = int(m.num_verts_per_mesh()[0])
        nf = int(m.num_faces_per_mesh()[0])
        v = np.asarray(m.verts_padded()[0][:nv])
        f = np.asarray(m.faces_padded()[0][:nf])
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "m.off")
            save_off(path, v, f)
            v2, f2 = load_off(path)
            np.testing.assert_allclose(np.asarray(v2), v, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(f2), f)

    def test_header_same_line(self):
        off = StringIO("OFF 3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
        v, f = load_off(off)
        assert v.shape == (3, 3) and f.shape == (1, 3)


class TestPluggableIO:
    def test_mesh_formats(self):
        m = ico_sphere(0)
        io = IO()
        with tempfile.TemporaryDirectory() as d:
            for ext in ("obj", "ply", "off"):
                path = os.path.join(d, f"m.{ext}")
                io.save_mesh(m, path)
                m2 = io.load_mesh(path)
                nv = int(m.num_verts_per_mesh()[0])
                np.testing.assert_allclose(
                    np.asarray(m2.verts_padded()[0][:nv]),
                    np.asarray(m.verts_padded()[0][:nv]),
                    atol=1e-5,
                )

    def test_unknown_format(self):
        io = IO()
        try:
            io.load_mesh("foo.xyz")
            assert False
        except ValueError:
            pass


class TestOffColors:
    """OFF/COFF colors (reference io/off_io.py:170 vertex colors, :57 face
    colors, scaling of integer 0-255 colors)."""

    def test_vertex_colors_float_roundtrip(self, tmp_path):
        from pytorch3d_tpu.io.off_io import load_off_full, save_off

        v = np.random.RandomState(0).rand(5, 3).astype(np.float32)
        f = np.asarray([[0, 1, 2], [2, 3, 4]], np.int64)
        c = np.random.RandomState(1).rand(5, 3).astype(np.float32)
        p = str(tmp_path / "m.off")
        save_off(p, v, f, verts_colors=c)
        assert open(p).readline().strip() == "COFF"
        data = load_off_full(p)
        np.testing.assert_allclose(np.asarray(data["verts"]), v, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(data["verts_colors"]), c, atol=1e-5
        )

    def test_integer_colors_are_scaled(self, tmp_path):
        from pytorch3d_tpu.io.off_io import load_off_full

        p = str(tmp_path / "m.off")
        with open(p, "w") as fh:
            fh.write("COFF\n3 1 0\n")
            fh.write("0 0 0 255 0 0\n1 0 0 0 255 0\n0 1 0 0 0 255\n")
            fh.write("3 0 1 2\n")
        data = load_off_full(p)
        np.testing.assert_allclose(
            np.asarray(data["verts_colors"]),
            np.eye(3, dtype=np.float32),
            atol=1e-6,
        )

    def test_face_colors_and_quad_triangulation(self, tmp_path):
        from pytorch3d_tpu.io.off_io import load_off_full

        p = str(tmp_path / "m.off")
        with open(p, "w") as fh:
            fh.write("OFF\n4 1 0\n")
            fh.write("0 0 0\n1 0 0\n1 1 0\n0 1 0\n")
            fh.write("4 0 1 2 3 0.9 0.1 0.2\n")  # quad with a face color
        data = load_off_full(p)
        assert data["faces"].shape == (2, 3)  # fan-triangulated
        np.testing.assert_allclose(
            np.asarray(data["faces_colors"]),
            [[0.9, 0.1, 0.2]] * 2,
            atol=1e-6,
        )

    def test_pluggable_io_textures(self, tmp_path):
        from pytorch3d_tpu.io.pluggable import IO

        p = str(tmp_path / "m.off")
        with open(p, "w") as fh:
            fh.write("COFF\n3 1 0\n")
            fh.write(
                "0 0 0 1.0 0.0 0.0\n1 0 0 0.0 1.0 0.0\n0 1 0 0.0 0.0 1.0\n"
            )
            fh.write("3 0 1 2\n")
        mesh = IO().load_mesh(p)
        feats = mesh.textures.verts_features_padded()
        np.testing.assert_allclose(
            np.asarray(feats[0]), np.eye(3, dtype=np.float32), atol=1e-6
        )


class TestR2N2VoxelUtils:
    """voxelize + render_cubified_voxels (reference r2n2/utils.py:353/:481)."""

    def test_voxelize_round_trip_positions(self):
        import jax

        from pytorch3d_tpu.datasets.r2n2.utils import voxelize

        pts = jax.random.uniform(
            jax.random.PRNGKey(0), (200, 3), minval=-0.3, maxval=0.3
        )
        P = np.eye(4, dtype=np.float32)
        P[2, 3] = 0.8  # push into the dataset z range
        vox = np.asarray(voxelize(pts, jnp.asarray(P), 32))
        assert vox.shape == (32, 32, 32) and vox.dtype == np.uint8
        assert 0 < vox.sum() <= 200

    def test_voxelize_out_of_range_dropped(self):
        from pytorch3d_tpu.datasets.r2n2.utils import voxelize

        pts = jnp.asarray([[50.0, 50.0, 50.0]])
        vox = np.asarray(voxelize(pts, jnp.eye(4), 8))
        assert vox.sum() == 0

    def test_render_cubified_voxels(self):
        from pytorch3d_tpu.datasets.r2n2.utils import render_cubified_voxels
        from pytorch3d_tpu.renderer import RasterizationSettings

        grid = np.zeros((1, 8, 8, 8), np.float32)
        grid[0, 2:6, 2:6, 2:6] = 1.0
        img = render_cubified_voxels(
            jnp.asarray(grid),
            raster_settings=RasterizationSettings(image_size=64),
        )
        arr = np.asarray(img)
        assert arr.shape[0] == 1 and arr.shape[-1] == 4
        assert np.isfinite(arr).all()
