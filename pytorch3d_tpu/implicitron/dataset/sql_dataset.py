"""SQL-backed frame dataset in the reference's CO3Dv2 sqlite format.

Parity: reference implicitron/dataset/sql_dataset.py:56 (`SqlIndexDataset`)
and orm_types.py.  SQLAlchemy is not part of this environment; the same
schema — frame_annots / sequence_annots tables with blob-encoded tuple
columns — is served with the stdlib sqlite3 driver via the codecs in
orm_types.py, so databases written by the reference are read verbatim.
`write_sql_dataset` is the ORM-writer equivalent.

Filters mirror the reference: subsets (via subset_lists_file, JSON or
sqlite `set_lists` table), remove_empty_masks, pick_categories,
pick_sequences/exclude_sequences, limit_sequences_per_category_to,
limit_sequences_to, limit_to, n_frames_per_sequence (seeded), plus
`dataset[seq_name, frame_number]` pair indexing and `.meta[i]`
metadata-only access.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sqlite3
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from ..tools.config import registry
from .dataset_base import DatasetBase
from .frame_data import FrameData, FrameDataBuilder
from .orm_types import (
    FRAME_ANNOT_COLUMNS,
    SEQUENCE_ANNOT_COLUMNS,
    SqlFrameAnnotation,
    SqlSequenceAnnotation,
)

_FRAME_COLS = ", ".join(f'"{c}"' for c, _ in FRAME_ANNOT_COLUMNS)
_SEQ_COLS = ", ".join(f'"{c}"' for c, _ in SEQUENCE_ANNOT_COLUMNS)

_FRAME_SCHEMA = f"""
CREATE TABLE IF NOT EXISTS frame_annots (
    sequence_name TEXT NOT NULL,
    frame_number INTEGER NOT NULL,
    frame_timestamp REAL,
    _image_path TEXT,
    _image_size BLOB,
    _depth_path TEXT,
    _depth_scale_adjustment REAL,
    _depth_mask_path TEXT,
    _mask_path TEXT,
    _mask_mass REAL,
    _mask_bounding_box_xywh BLOB,
    _viewpoint_R BLOB,
    _viewpoint_T BLOB,
    _viewpoint_focal_length BLOB,
    _viewpoint_principal_point BLOB,
    _viewpoint_intrinsics_format TEXT,
    PRIMARY KEY (sequence_name, frame_number)
);
"""
_SEQ_SCHEMA = """
CREATE TABLE IF NOT EXISTS sequence_annots (
    sequence_name TEXT PRIMARY KEY,
    category TEXT,
    _video_path TEXT,
    _video_length REAL,
    _point_cloud_path TEXT,
    _point_cloud_quality_score REAL,
    _point_cloud_n_points INTEGER,
    viewpoint_quality_score REAL
);
"""
_SET_LISTS_SCHEMA = """
CREATE TABLE IF NOT EXISTS set_lists (
    sequence_name TEXT NOT NULL,
    frame_number INTEGER NOT NULL,
    subset TEXT NOT NULL
);
"""


def _annot_from_dict(f: Dict[str, Any]) -> SqlFrameAnnotation:
    """CO3D-style nested dict -> typed row."""
    from .types import (
        DepthAnnotation,
        ImageAnnotation,
        MaskAnnotation,
        ViewpointAnnotation,
    )

    img = f.get("image") or {}
    dep = f.get("depth") or {}
    msk = f.get("mask") or {}
    vp = f.get("viewpoint") or {}
    return SqlFrameAnnotation(
        sequence_name=f["sequence_name"],
        frame_number=f.get("frame_number", 0),
        frame_timestamp=f.get("frame_timestamp"),
        image=ImageAnnotation(
            path=img.get("path"), size=tuple(img["size"])
            if img.get("size") is not None else None,
        )
        if img
        else None,
        depth=DepthAnnotation(
            path=dep.get("path"),
            scale_adjustment=dep.get("scale_adjustment", 1.0),
            mask_path=dep.get("mask_path"),
        )
        if dep.get("path") is not None
        else None,
        mask=MaskAnnotation(
            path=msk.get("path"),
            mass=msk.get("mass"),
            bounding_box_xywh=msk.get("bounding_box_xywh"),
        )
        if msk.get("path") is not None
        else None,
        viewpoint=ViewpointAnnotation(
            R=vp["R"],
            T=vp["T"],
            focal_length=vp["focal_length"],
            principal_point=vp["principal_point"],
            intrinsics_format=vp.get(
                "intrinsics_format", "ndc_norm_image_bounds"
            ),
        )
        if vp.get("R") is not None
        else None,
    )


def write_sql_dataset(
    db_path: str,
    frame_annots: List[Union[Dict[str, Any], SqlFrameAnnotation]],
    sequence_annots: Optional[
        List[Union[Dict[str, Any], SqlSequenceAnnotation]]
    ] = None,
    set_lists: Optional[Dict[str, List[Tuple[str, int]]]] = None,
) -> None:
    """Create an annotation database in the reference's CO3Dv2 format.

    Accepts CO3D-style nested dicts or typed Sql*Annotation rows.
    `set_lists` optionally writes a set_lists table
    ({subset: [(sequence_name, frame_number), ...]}).
    """
    conn = sqlite3.connect(db_path)
    try:
        conn.execute(_FRAME_SCHEMA)
        conn.execute(_SEQ_SCHEMA)
        ph = ",".join("?" * len(FRAME_ANNOT_COLUMNS))
        for f in frame_annots:
            annot = f if isinstance(f, SqlFrameAnnotation) else _annot_from_dict(f)
            conn.execute(
                f"INSERT OR REPLACE INTO frame_annots ({_FRAME_COLS}) "
                f"VALUES ({ph})",
                annot.to_row(),
            )
        ph = ",".join("?" * len(SEQUENCE_ANNOT_COLUMNS))
        for s in sequence_annots or []:
            if isinstance(s, SqlSequenceAnnotation):
                row = s.to_row()
            else:
                from .types import PointCloudAnnotation, VideoAnnotation

                row = SqlSequenceAnnotation(
                    sequence_name=s["sequence_name"],
                    category=s.get("category"),
                    video=VideoAnnotation(
                        path=s["video_path"], length=s.get("video_length", 0.0)
                    )
                    if s.get("video_path")
                    else None,
                    point_cloud=PointCloudAnnotation(
                        path=s["point_cloud_path"],
                        quality_score=s.get("point_cloud_quality_score", 0.0),
                        n_points=s.get("point_cloud_n_points"),
                    )
                    if s.get("point_cloud_path")
                    else None,
                    viewpoint_quality_score=s.get("viewpoint_quality_score"),
                ).to_row()
            conn.execute(
                f"INSERT OR REPLACE INTO sequence_annots ({_SEQ_COLS}) "
                f"VALUES ({ph})",
                row,
            )
        if set_lists:
            conn.execute(_SET_LISTS_SCHEMA)
            for subset, pairs in set_lists.items():
                for item in pairs:
                    seq, fn = item[0], item[1]
                    conn.execute(
                        "INSERT INTO set_lists VALUES (?,?,?)",
                        (seq, int(fn), subset),
                    )
        conn.commit()
    finally:
        conn.close()


class _MetaAccessor:
    """`dataset.meta[i]`: metadata-only FrameData (no blob loading),
    mirroring the reference's meta accessor (sql_dataset.py:63)."""

    def __init__(self, ds: "SqlIndexDataset"):
        self._ds = ds

    def __getitem__(self, index) -> FrameData:
        return self._ds._get_item(index, load_blobs=False)


@registry.register
@dataclasses.dataclass
class SqlIndexDataset(DatasetBase):
    """Frames indexed in a sqlite database (reference sql_dataset.py:56)."""

    frame_annotations_type = SqlFrameAnnotation
    sequence_annotations_type = SqlSequenceAnnotation

    sqlite_metadata_file: str = ""
    dataset_root: str = ""
    subset_lists_file: str = ""
    eval_batches_file: Optional[str] = None
    subsets: Optional[List[str]] = None
    remove_empty_masks: bool = False
    pick_categories: tuple = ()
    pick_sequences: tuple = ()
    exclude_sequences: tuple = ()
    limit_sequences_per_category_to: int = 0
    limit_sequences_to: int = 0
    limit_to: int = 0
    n_frames_per_sequence: int = -1
    seed: int = 0
    preload_metadata: bool = False
    precompute_seq_to_idx: bool = False
    # legacy aliases (kept for earlier-round callers)
    pick_sequence: tuple = ()
    exclude_sequence: tuple = ()
    # FrameDataBuilder knobs (flattened, like JsonIndexDataset)
    load_images: bool = True
    load_depths: bool = True
    load_depth_masks: bool = True
    load_masks: bool = True
    image_height: Optional[int] = 256
    image_width: Optional[int] = 256
    box_crop: bool = False
    box_crop_context: float = 0.3
    box_crop_mask_thr: float = 0.4

    def __post_init__(self):
        self._annots: List[SqlFrameAnnotation] = []
        self._seq_annots: Dict[str, SqlSequenceAnnotation] = {}
        self._pair_index: Dict[Tuple[str, int], int] = {}
        self._seq_to_idx: Dict[str, List[int]] = {}
        self.eval_batches: Optional[List[Any]] = None
        self.meta = _MetaAccessor(self)
        if self.pick_sequence and not self.pick_sequences:
            self.pick_sequences = tuple(self.pick_sequence)
        if self.exclude_sequence and not self.exclude_sequences:
            self.exclude_sequences = tuple(self.exclude_sequence)
        if self.sqlite_metadata_file:
            self._load()

    # ------------------------------------------------------------------ #

    def _load_subset_pairs(self) -> Optional[set]:
        """(sequence_name, frame_number) pairs allowed by `subsets`."""
        if not self.subsets:
            return None
        pairs: set = set()
        if self.subset_lists_file:
            if self.subset_lists_file.endswith((".json",)):
                with open(self.subset_lists_file) as f:
                    lists = json.load(f)
                for subset in self.subsets:
                    for item in lists.get(subset, []):
                        pairs.add((item[0], int(item[1])))
            else:  # sqlite set_lists table (the reference's V2 layout)
                conn = sqlite3.connect(self.subset_lists_file)
                try:
                    ph = ",".join("?" * len(self.subsets))
                    for seq, fn in conn.execute(
                        "SELECT sequence_name, frame_number FROM set_lists "
                        f"WHERE subset IN ({ph})",
                        list(self.subsets),
                    ):
                        pairs.add((seq, int(fn)))
                finally:
                    conn.close()
        else:
            # set_lists may live inside the metadata db itself
            conn = sqlite3.connect(self.sqlite_metadata_file)
            try:
                tables = {
                    r[0]
                    for r in conn.execute(
                        "SELECT name FROM sqlite_master WHERE type='table'"
                    )
                }
                if "set_lists" not in tables:
                    raise ValueError(
                        "subsets specified but no subset_lists_file and no "
                        "set_lists table in the metadata database"
                    )
                ph = ",".join("?" * len(self.subsets))
                for seq, fn in conn.execute(
                    "SELECT sequence_name, frame_number FROM set_lists "
                    f"WHERE subset IN ({ph})",
                    list(self.subsets),
                ):
                    pairs.add((seq, int(fn)))
            finally:
                conn.close()
        return pairs

    def _load(self):
        conn = sqlite3.connect(self.sqlite_metadata_file)
        try:
            rows = conn.execute(
                f"SELECT {_FRAME_COLS} FROM frame_annots "
                "ORDER BY sequence_name, frame_number"
            ).fetchall()
            seq_rows = conn.execute(
                f"SELECT {_SEQ_COLS} FROM sequence_annots"
            ).fetchall()
        finally:
            conn.close()

        annots = [SqlFrameAnnotation.from_row(r) for r in rows]
        self._seq_annots = {
            r[0]: SqlSequenceAnnotation.from_row(r) for r in seq_rows
        }

        subset_pairs = self._load_subset_pairs()
        if subset_pairs is not None:
            annots = [
                a
                for a in annots
                if (a.sequence_name, a.frame_number) in subset_pairs
            ]

        if self.remove_empty_masks:
            annots = [
                a
                for a in annots
                if a.mask is None or a.mask.mass is None or a.mask.mass > 0
            ]

        # sequence-level filters
        seq_names = []
        for a in annots:
            if a.sequence_name not in seq_names:
                seq_names.append(a.sequence_name)
        allowed = set(seq_names)
        if self.pick_categories:
            allowed = {
                s
                for s in allowed
                if self._seq_annots.get(s)
                and self._seq_annots[s].category in self.pick_categories
            }
        if self.pick_sequences:
            allowed &= set(self.pick_sequences)
        if self.exclude_sequences:
            allowed -= set(self.exclude_sequences)
        seq_names = [s for s in seq_names if s in allowed]
        if self.limit_sequences_per_category_to > 0:
            per_cat: Dict[str, int] = {}
            kept = []
            for s in seq_names:
                cat = (
                    self._seq_annots[s].category
                    if s in self._seq_annots
                    else ""
                )
                per_cat[cat] = per_cat.get(cat, 0) + 1
                if per_cat[cat] <= self.limit_sequences_per_category_to:
                    kept.append(s)
            seq_names = kept
        if self.limit_sequences_to > 0:
            seq_names = seq_names[: self.limit_sequences_to]
        keep = set(seq_names)
        annots = [a for a in annots if a.sequence_name in keep]

        # frame-level filters
        if self.n_frames_per_sequence > 0:
            rng = np.random.RandomState(self.seed)
            by_seq: Dict[str, List[SqlFrameAnnotation]] = {}
            for a in annots:
                by_seq.setdefault(a.sequence_name, []).append(a)
            annots = []
            for seq in seq_names:
                rs = by_seq.get(seq, [])
                if len(rs) > self.n_frames_per_sequence:
                    idx = rng.choice(
                        len(rs), self.n_frames_per_sequence, replace=False
                    )
                    rs = [rs[i] for i in sorted(idx)]
                annots.extend(rs)
        if self.limit_to > 0:
            annots = annots[: self.limit_to]

        self._annots = annots
        self._pair_index = {
            (a.sequence_name, a.frame_number): i
            for i, a in enumerate(annots)
        }
        self._seq_to_idx = {}
        for i, a in enumerate(annots):
            self._seq_to_idx.setdefault(a.sequence_name, []).append(i)

        if self.eval_batches_file:
            with open(self.eval_batches_file) as f:
                raw = json.load(f)
            self.eval_batches = [
                [self._pair_index[(it[0], int(it[1]))] for it in batch
                 if (it[0], int(it[1])) in self._pair_index]
                for batch in raw
            ]

    # ------------------------------------------------------------------ #

    def frame_data_builder(self) -> FrameDataBuilder:
        return FrameDataBuilder(
            dataset_root=self.dataset_root,
            load_images=self.load_images,
            load_depths=self.load_depths,
            load_depth_masks=self.load_depth_masks,
            load_masks=self.load_masks,
            image_height=self.image_height,
            image_width=self.image_width,
            box_crop=self.box_crop,
            box_crop_context=self.box_crop_context,
            box_crop_mask_thr=self.box_crop_mask_thr,
        )

    def __len__(self) -> int:
        return len(self._annots)

    def sequence_names(self) -> List[str]:
        return list(self._seq_to_idx.keys())

    def category_to_sequence_names(self) -> Dict[str, List[str]]:
        out: Dict[str, List[str]] = {}
        for s in self.sequence_names():
            cat = self.sequence_category(s)
            out.setdefault(cat, []).append(s)
        return out

    def sequence_category(self, seq_name: str) -> str:
        sa = self._seq_annots.get(seq_name)
        return sa.category if sa and sa.category else "default"

    def sequence_annotation(self, seq_name: str) -> SqlSequenceAnnotation:
        return self._seq_annots[seq_name]

    def sequence_indices_in_order(self, seq_name: str):
        yield from self._seq_to_idx.get(seq_name, [])

    def sequence_frames_in_order(self, seq_name: str):
        for i in self._seq_to_idx.get(seq_name, []):
            a = self._annots[i]
            yield (a.frame_timestamp or 0.0, a.frame_number, i)

    def get_frame_numbers_and_timestamps(self, idxs, subset_filter=None):
        out = []
        for i in idxs:
            a = self._annots[int(i)]
            out.append((a.frame_number, a.frame_timestamp or 0.0))
        return out

    # ------------------------------------------------------------------ #

    def _get_item(self, index, load_blobs: bool = True) -> FrameData:
        if isinstance(index, tuple):
            seq, fn = index
            i = self._pair_index[(seq, int(fn))]
        else:
            i = int(index)
        a = self._annots[i]
        builder = self.frame_data_builder()
        if not load_blobs:
            builder = dataclasses.replace(
                builder,
                load_images=False,
                load_depths=False,
                load_depth_masks=False,
                load_masks=False,
            )
        fd = builder.build(
            a.as_co3d_dict(),
            sequence_annotation={
                "sequence_name": a.sequence_name,
                "category": self.sequence_category(a.sequence_name),
            },
        )
        return fd

    def __getitem__(self, index) -> FrameData:
        return self._get_item(index, load_blobs=True)
