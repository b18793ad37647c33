"""Reference-exact CO3Dv2 sqlite schema: blob codecs, typed rows,
pair indexing, subsets via set_lists tables, meta accessor.

Parity: reference implicitron/dataset/orm_types.py (byte layouts of
TupleTypeFactory :83 / ArrayTypeFactory :36) and sql_dataset.py:56
(SqlIndexDataset filter/indexing semantics).
"""

import os
import sqlite3
import struct

import numpy as np
import pytest

from pytorch3d_tpu.implicitron.dataset.orm_types import (
    ArrayTypeFactory,
    FRAME_ANNOT_COLUMNS,
    SqlFrameAnnotation,
    SqlSequenceAnnotation,
    TupleTypeFactory,
)
from pytorch3d_tpu.implicitron.dataset.sql_dataset import (
    SqlIndexDataset,
    write_sql_dataset,
)
from pytorch3d_tpu.implicitron.dataset.types import (
    ImageAnnotation,
    MaskAnnotation,
    ViewpointAnnotation,
)


class TestBlobCodecs:
    def test_tuple_codec_byte_layout(self):
        """float tuples are raw packed f32 with no header — the byte
        string the reference's SQLAlchemy writer produces."""
        T2 = TupleTypeFactory(float, (2,))
        raw = T2.process_bind_param((1.5, -2.0))
        assert raw == struct.pack("ff", 1.5, -2.0)
        assert T2.process_result_value(raw) == (1.5, -2.0)

        TI = TupleTypeFactory(int, (2,))
        raw = TI.process_bind_param((800, 600))
        assert raw == struct.pack("ii", 800, 600)
        assert TI.process_result_value(raw) == (800, 600)

    def test_tuple_codec_nested_shape(self):
        T33 = TupleTypeFactory(float, (3, 3))
        R = tuple(tuple(float(3 * i + j) for j in range(3)) for i in range(3))
        raw = T33.process_bind_param(R)
        assert len(raw) == 9 * 4
        out = T33.process_result_value(raw)
        assert out == R  # recursively tuple-ized

    def test_tuple_codec_none_passthrough(self):
        T = TupleTypeFactory(float, (4,))
        assert T.process_bind_param(None) is None
        assert T.process_result_value(None) is None

    def test_array_codec_variable_shape(self):
        A = ArrayTypeFactory()
        x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        raw = A.process_bind_param(x)
        # header: int32 ndim + int64 shape
        assert np.frombuffer(raw[:4], np.int32)[0] == 3
        np.testing.assert_array_equal(
            np.frombuffer(raw[4:28], np.int64), [2, 3, 4]
        )
        np.testing.assert_array_equal(A.process_result_value(raw), x)

    def test_array_codec_fixed_shape(self):
        A = ArrayTypeFactory((3, 3))
        x = np.eye(3, dtype=np.float32)
        raw = A.process_bind_param(x)
        assert len(raw) == 9 * 4
        np.testing.assert_array_equal(A.process_result_value(raw), x)
        with pytest.raises(ValueError):
            A.process_bind_param(np.zeros((2, 2)))


def _vp(seed=0.0):
    return ViewpointAnnotation(
        R=tuple(
            tuple(float(i == j) + seed * 0.01 for j in range(3))
            for i in range(3)
        ),
        T=(seed, 0.0, 2.0),
        focal_length=(2.0, 2.0),
        principal_point=(0.0, 0.0),
    )


def _frames():
    out = []
    for seq, cat_frames in [("seqA", 4), ("seqB", 3)]:
        for fn in range(cat_frames):
            out.append(
                SqlFrameAnnotation(
                    sequence_name=seq,
                    frame_number=fn,
                    frame_timestamp=0.1 * fn,
                    image=ImageAnnotation(
                        path=f"{seq}/img{fn}.png", size=(8, 10)
                    ),
                    mask=MaskAnnotation(
                        path=f"{seq}/mask{fn}.png",
                        mass=0.0 if (seq, fn) == ("seqB", 2) else 50.0,
                    ),
                    viewpoint=_vp(float(fn)),
                )
            )
    return out


def _seqs():
    return [
        SqlSequenceAnnotation(sequence_name="seqA", category="chair"),
        SqlSequenceAnnotation(sequence_name="seqB", category="plant"),
    ]


class TestSqlIndexDatasetSchema:
    def test_typed_row_roundtrip_through_sqlite(self, tmp_path):
        db = str(tmp_path / "a.sqlite")
        frames = _frames()
        write_sql_dataset(db, frames, _seqs())
        # raw column check: reference column names present
        conn = sqlite3.connect(db)
        cols = [r[1] for r in conn.execute("PRAGMA table_info(frame_annots)")]
        conn.close()
        assert cols == [c for c, _ in FRAME_ANNOT_COLUMNS]

        ds = SqlIndexDataset(sqlite_metadata_file=db, load_images=False,
                             load_masks=False)
        assert len(ds) == 7
        a = ds._annots[1]
        assert a.image.size == (8, 10)
        assert a.viewpoint.T == (1.0, 0.0, 2.0)
        np.testing.assert_allclose(
            np.asarray(a.viewpoint.R), np.asarray(_vp(1.0).R), atol=1e-6
        )

    def test_pair_indexing_and_meta(self, tmp_path):
        db = str(tmp_path / "b.sqlite")
        write_sql_dataset(db, _frames(), _seqs())
        ds = SqlIndexDataset(sqlite_metadata_file=db, load_images=False,
                             load_masks=False)
        fd = ds["seqB", 1]
        assert fd.sequence_name == "seqB" and int(fd.frame_number) == 1
        assert fd.sequence_category == "plant"
        fd_meta = ds.meta[0]
        assert fd_meta.image_rgb is None  # no blob loading
        assert fd_meta.camera is not None

    def test_filters(self, tmp_path):
        db = str(tmp_path / "c.sqlite")
        write_sql_dataset(db, _frames(), _seqs())
        assert len(SqlIndexDataset(
            sqlite_metadata_file=db, remove_empty_masks=True,
            load_images=False, load_masks=False)) == 6
        assert len(SqlIndexDataset(
            sqlite_metadata_file=db, pick_categories=("chair",),
            load_images=False, load_masks=False)) == 4
        assert len(SqlIndexDataset(
            sqlite_metadata_file=db, exclude_sequences=("seqA",),
            load_images=False, load_masks=False)) == 3
        assert len(SqlIndexDataset(
            sqlite_metadata_file=db, n_frames_per_sequence=2,
            load_images=False, load_masks=False)) == 4
        assert len(SqlIndexDataset(
            sqlite_metadata_file=db, limit_sequences_to=1,
            load_images=False, load_masks=False)) == 4
        ds = SqlIndexDataset(
            sqlite_metadata_file=db,
            limit_sequences_per_category_to=1,
            load_images=False, load_masks=False)
        assert sorted(ds.sequence_names()) == ["seqA", "seqB"]

    def test_subsets_via_set_lists_table(self, tmp_path):
        db = str(tmp_path / "d.sqlite")
        write_sql_dataset(
            db, _frames(), _seqs(),
            set_lists={
                "train": [("seqA", 0), ("seqA", 1), ("seqB", 0)],
                "test": [("seqA", 3)],
            },
        )
        tr = SqlIndexDataset(
            sqlite_metadata_file=db, subsets=["train"],
            load_images=False, load_masks=False)
        te = SqlIndexDataset(
            sqlite_metadata_file=db, subsets=["test"],
            load_images=False, load_masks=False)
        both = SqlIndexDataset(
            sqlite_metadata_file=db, subsets=["train", "test"],
            load_images=False, load_masks=False)
        assert (len(tr), len(te), len(both)) == (3, 1, 4)

    def test_sequence_frames_in_order(self, tmp_path):
        db = str(tmp_path / "e.sqlite")
        write_sql_dataset(db, _frames(), _seqs())
        ds = SqlIndexDataset(sqlite_metadata_file=db, load_images=False,
                             load_masks=False)
        trip = list(ds.sequence_frames_in_order("seqA"))
        assert [t[1] for t in trip] == [0, 1, 2, 3]
        cat_map = ds.category_to_sequence_names()
        assert cat_map == {"chair": ["seqA"], "plant": ["seqB"]}
