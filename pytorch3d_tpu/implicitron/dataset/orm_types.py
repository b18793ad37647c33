"""SQL annotation row types.

Parity: reference implicitron/dataset/orm_types.py (SQLAlchemy ORM
classes `SqlFrameAnnotation`, `SqlSequenceAnnotation`). SQLAlchemy is
not part of this environment; sql_dataset.py serves the same schema
with the stdlib sqlite3 driver, and these dataclasses describe the row
layouts it reads/writes (see sql_dataset._FRAME_SCHEMA/_SEQ_SCHEMA).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class SqlFrameAnnotation:
    """One row of the frame_annots table (reference orm_types.py)."""

    sequence_name: str
    frame_number: int
    frame_timestamp: Optional[float] = None
    image_path: Optional[str] = None
    image_size: Optional[Tuple[int, int]] = None
    mask_path: Optional[str] = None
    depth_path: Optional[str] = None
    viewpoint_json: Optional[str] = None


@dataclasses.dataclass
class SqlSequenceAnnotation:
    """One row of the sequence_annots table (reference orm_types.py)."""

    sequence_name: str
    category: Optional[str] = None
    video_path: Optional[str] = None
    viewpoint_quality_score: Optional[float] = None
