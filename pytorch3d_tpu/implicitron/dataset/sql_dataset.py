"""SQL-backed frame dataset.

Parity: reference implicitron/dataset/sql_dataset.py:31-44 (`SqlIndexDataset`
over SQLAlchemy ORM, orm_types.py).  SQLAlchemy is not part of this
environment; the same schema (frame_annots / sequence_annots tables) is
served with the stdlib sqlite3 driver.  `write_sql_dataset` creates the
tables from in-memory annotation dicts (the ORM-writer equivalent).
"""

from __future__ import annotations

import dataclasses
import json
import sqlite3
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ...renderer.cameras import PerspectiveCameras
from ..tools.config import registry
from .dataset_base import DatasetBase
from .frame_data import FrameData

_FRAME_SCHEMA = """
CREATE TABLE IF NOT EXISTS frame_annots (
    sequence_name TEXT NOT NULL,
    frame_number INTEGER NOT NULL,
    frame_timestamp REAL,
    image_path TEXT,
    image_size_h INTEGER,
    image_size_w INTEGER,
    mask_path TEXT,
    depth_path TEXT,
    viewpoint_json TEXT,
    PRIMARY KEY (sequence_name, frame_number)
);
"""
_SEQ_SCHEMA = """
CREATE TABLE IF NOT EXISTS sequence_annots (
    sequence_name TEXT PRIMARY KEY,
    category TEXT,
    video_path TEXT,
    viewpoint_quality_score REAL
);
"""


def write_sql_dataset(
    db_path: str,
    frame_annots: List[Dict[str, Any]],
    sequence_annots: Optional[List[Dict[str, Any]]] = None,
) -> None:
    """Create an annotation database from CO3D-style dicts."""
    conn = sqlite3.connect(db_path)
    try:
        conn.execute(_FRAME_SCHEMA)
        conn.execute(_SEQ_SCHEMA)
        for f in frame_annots:
            size = f.get("image", {}).get("size", (None, None))
            conn.execute(
                "INSERT OR REPLACE INTO frame_annots VALUES (?,?,?,?,?,?,?,?,?)",
                (
                    f["sequence_name"],
                    f.get("frame_number", 0),
                    f.get("frame_timestamp"),
                    f.get("image", {}).get("path"),
                    size[0],
                    size[1],
                    f.get("mask", {}).get("path"),
                    f.get("depth", {}).get("path"),
                    json.dumps(f.get("viewpoint", {})),
                ),
            )
        for s in sequence_annots or []:
            conn.execute(
                "INSERT OR REPLACE INTO sequence_annots VALUES (?,?,?,?)",
                (
                    s["sequence_name"],
                    s.get("category"),
                    s.get("video_path"),
                    s.get("viewpoint_quality_score"),
                ),
            )
        conn.commit()
    finally:
        conn.close()


@registry.register
@dataclasses.dataclass
class SqlIndexDataset(DatasetBase):
    """Frames indexed in a sqlite database (reference sql_dataset.py:31)."""

    sqlite_metadata_file: str = ""
    dataset_root: str = ""
    pick_sequence: tuple = ()
    exclude_sequence: tuple = ()
    limit_to: int = 0
    n_frames_per_sequence: int = -1
    seed: int = 0
    load_images: bool = True
    image_height: Optional[int] = 256
    image_width: Optional[int] = 256

    def __post_init__(self):
        self._rows: List[tuple] = []
        self._categories: Dict[str, str] = {}
        if self.sqlite_metadata_file:
            self._load()

    def _load(self):
        conn = sqlite3.connect(self.sqlite_metadata_file)
        try:
            q = (
                "SELECT sequence_name, frame_number, image_path, mask_path, "
                "viewpoint_json FROM frame_annots"
            )
            clauses, params = [], []
            if self.pick_sequence:
                clauses.append(
                    "sequence_name IN (%s)"
                    % ",".join("?" * len(self.pick_sequence))
                )
                params += list(self.pick_sequence)
            if self.exclude_sequence:
                clauses.append(
                    "sequence_name NOT IN (%s)"
                    % ",".join("?" * len(self.exclude_sequence))
                )
                params += list(self.exclude_sequence)
            if clauses:
                q += " WHERE " + " AND ".join(clauses)
            q += " ORDER BY sequence_name, frame_number"
            rows = conn.execute(q, params).fetchall()
            for seq, cat in conn.execute(
                "SELECT sequence_name, category FROM sequence_annots"
            ):
                self._categories[seq] = cat
        finally:
            conn.close()

        if self.n_frames_per_sequence > 0:
            rng = np.random.RandomState(self.seed)
            by_seq: Dict[str, List[tuple]] = {}
            for r in rows:
                by_seq.setdefault(r[0], []).append(r)
            rows = []
            for seq, rs in by_seq.items():
                if len(rs) > self.n_frames_per_sequence:
                    idx = rng.choice(
                        len(rs), self.n_frames_per_sequence, replace=False
                    )
                    rs = [rs[i] for i in sorted(idx)]
                rows.extend(rs)
        if self.limit_to > 0:
            rows = rows[: self.limit_to]
        self._rows = rows

    def __len__(self) -> int:
        return len(self._rows)

    def sequence_names(self) -> List[str]:
        return sorted({r[0] for r in self._rows})

    def sequence_category(self, seq_name: str) -> str:
        return self._categories.get(seq_name, "default")

    def sequence_indices_in_order(self, seq_name: str):
        for i, r in enumerate(self._rows):
            if r[0] == seq_name:
                yield i

    def __getitem__(self, index) -> FrameData:
        seq, frame_no, image_path, mask_path, vp_json = self._rows[index]
        vp = json.loads(vp_json) if vp_json else {}
        camera = None
        if vp:
            camera = PerspectiveCameras.create(
                R=jnp.asarray(vp["R"], jnp.float32)[None],
                T=jnp.asarray(vp["T"], jnp.float32)[None],
                focal_length=jnp.asarray(vp["focal_length"], jnp.float32)[None],
                principal_point=jnp.asarray(
                    vp["principal_point"], jnp.float32
                )[None],
            )
        return FrameData(
            frame_number=frame_no,
            sequence_name=seq,
            sequence_category=self.sequence_category(seq),
            image_path=image_path,
            mask_path=mask_path,
            camera=camera,
        )
