"""SQL annotation schema: the reference's CO3Dv2 sqlite format.

Parity: reference implicitron/dataset/orm_types.py — `ArrayTypeFactory`
:36, `TupleTypeFactory` :83, `SqlFrameAnnotation` :127,
`SqlSequenceAnnotation` :172.  SQLAlchemy is not part of this
environment, so the TypeDecorator factories here return plain codec
classes exposing the same `process_bind_param`/`process_result_value`
byte layout (used by sql_dataset.py's stdlib-sqlite3 driver), and the
row classes are dataclasses composed of the `types.py` annotation
dataclasses with explicit column specs.  Databases written by the
reference's SQLAlchemy writer are read bit-for-bit and vice versa.
"""

from __future__ import annotations

import dataclasses
import math
import struct
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .types import (
    DepthAnnotation,
    ImageAnnotation,
    MaskAnnotation,
    PointCloudAnnotation,
    VideoAnnotation,
    ViewpointAnnotation,
)


def ArrayTypeFactory(shape=None):
    """Codec for float32 numpy-array blobs (reference orm_types.py:36).

    shape=None: variable-shape layout `int32 ndim | int64*ndim shape |
    float32 data`.  Fixed shape: raw float32 data only.
    """
    if shape is None:

        class VariableShapeNumpyArrayType:
            @staticmethod
            def process_bind_param(value, dialect=None):
                if value is None:
                    return None
                ndim_bytes = np.int32(value.ndim).tobytes()
                shape_bytes = np.array(value.shape, dtype=np.int64).tobytes()
                value_bytes = np.asarray(value, np.float32).tobytes()
                return ndim_bytes + shape_bytes + value_bytes

            @staticmethod
            def process_result_value(value, dialect=None):
                if value is None:
                    return None
                ndim = int(np.frombuffer(value[:4], dtype=np.int32)[0])
                value_start = 4 + 8 * ndim
                shp = np.frombuffer(value[4:value_start], dtype=np.int64)
                return np.frombuffer(
                    value[value_start:], dtype=np.float32
                ).reshape(shp)

        return VariableShapeNumpyArrayType

    class NumpyArrayType:
        @staticmethod
        def process_bind_param(value, dialect=None):
            if value is None:
                return None
            value = np.asarray(value)
            if value.shape != tuple(shape):
                raise ValueError(
                    f"Passed an array of wrong shape: {value.shape}"
                )
            return value.astype(np.float32).tobytes()

        @staticmethod
        def process_result_value(value, dialect=None):
            if value is None:
                return None
            return np.frombuffer(value, dtype=np.float32).reshape(shape)

    return NumpyArrayType


def _rec_totuple(t):
    if isinstance(t, list):
        return tuple(_rec_totuple(x) for x in t)
    return t


def TupleTypeFactory(dtype=float, shape: Tuple[int, ...] = (2,)):
    """Codec for fixed-shape tuple blobs: packed f/i per element with no
    header (reference orm_types.py:83)."""
    format_symbol = {float: "f", int: "i"}[dtype]

    class TupleType:
        _format = format_symbol * math.prod(shape)
        _shape = tuple(shape)

        @staticmethod
        def process_bind_param(value, dialect=None):
            if value is None:
                return None
            if len(shape) > 1:
                value = np.array(value, dtype=dtype).reshape(-1)
            return struct.pack(TupleType._format, *value)

        @staticmethod
        def process_result_value(value, dialect=None):
            if value is None:
                return None
            loaded = struct.unpack(TupleType._format, value)
            if len(shape) > 1:
                loaded = _rec_totuple(
                    np.array(loaded, dtype=dtype).reshape(shape).tolist()
                )
            return loaded

    return TupleType


class Base:
    """Stand-in for the reference's `MappedAsDataclass, DeclarativeBase`
    root; subclasses here are plain dataclasses."""


# ---- column specs: (sql column name, codec-or-None) in table order ---- #
# Codecs follow the reference's mapped_column(...) declarations exactly.

FRAME_ANNOT_COLUMNS: Tuple[Tuple[str, Any], ...] = (
    ("sequence_name", None),
    ("frame_number", None),
    ("frame_timestamp", None),
    ("_image_path", None),
    ("_image_size", TupleTypeFactory(int)),
    ("_depth_path", None),
    ("_depth_scale_adjustment", None),
    ("_depth_mask_path", None),
    ("_mask_path", None),
    ("_mask_mass", None),
    ("_mask_bounding_box_xywh", TupleTypeFactory(float, shape=(4,))),
    ("_viewpoint_R", TupleTypeFactory(float, shape=(3, 3))),
    ("_viewpoint_T", TupleTypeFactory(float, shape=(3,))),
    ("_viewpoint_focal_length", TupleTypeFactory(float)),
    ("_viewpoint_principal_point", TupleTypeFactory(float)),
    ("_viewpoint_intrinsics_format", None),
)

SEQUENCE_ANNOT_COLUMNS: Tuple[Tuple[str, Any], ...] = (
    ("sequence_name", None),
    ("category", None),
    ("_video_path", None),
    ("_video_length", None),
    ("_point_cloud_path", None),
    ("_point_cloud_quality_score", None),
    ("_point_cloud_n_points", None),
    ("viewpoint_quality_score", None),
)


@dataclasses.dataclass
class SqlFrameAnnotation(Base):
    """One row of frame_annots (reference orm_types.py:127)."""

    __tablename__ = "frame_annots"

    sequence_name: str
    frame_number: int
    frame_timestamp: Optional[float] = None
    image: Optional[ImageAnnotation] = None
    depth: Optional[DepthAnnotation] = None
    mask: Optional[MaskAnnotation] = None
    viewpoint: Optional[ViewpointAnnotation] = None

    def to_row(self) -> tuple:
        img, dep, msk, vp = self.image, self.depth, self.mask, self.viewpoint
        enc_int2 = FRAME_ANNOT_COLUMNS[4][1].process_bind_param
        enc_f4 = FRAME_ANNOT_COLUMNS[10][1].process_bind_param
        enc_R = FRAME_ANNOT_COLUMNS[11][1].process_bind_param
        enc_T = FRAME_ANNOT_COLUMNS[12][1].process_bind_param
        enc_f2 = FRAME_ANNOT_COLUMNS[13][1].process_bind_param
        return (
            self.sequence_name,
            self.frame_number,
            self.frame_timestamp,
            img.path if img else None,
            enc_int2(tuple(img.size)) if img and img.size else None,
            dep.path if dep else None,
            dep.scale_adjustment if dep else None,
            dep.mask_path if dep else None,
            msk.path if msk else None,
            msk.mass if msk else None,
            enc_f4(msk.bounding_box_xywh)
            if msk and msk.bounding_box_xywh is not None
            else None,
            enc_R(vp.R) if vp else None,
            enc_T(vp.T) if vp else None,
            enc_f2(vp.focal_length) if vp else None,
            enc_f2(vp.principal_point) if vp else None,
            vp.intrinsics_format if vp else None,
        )

    @classmethod
    def from_row(cls, row: tuple) -> "SqlFrameAnnotation":
        dec = {
            name: (codec.process_result_value(val) if codec else val)
            for (name, codec), val in zip(FRAME_ANNOT_COLUMNS, row)
        }
        image = (
            ImageAnnotation(
                path=dec["_image_path"],
                size=tuple(dec["_image_size"])
                if dec["_image_size"] is not None
                else None,
            )
            if dec["_image_path"] is not None
            or dec["_image_size"] is not None
            else None
        )
        depth = (
            DepthAnnotation(
                path=dec["_depth_path"],
                scale_adjustment=dec["_depth_scale_adjustment"],
                mask_path=dec["_depth_mask_path"],
            )
            if dec["_depth_path"] is not None
            else None
        )
        mask = (
            MaskAnnotation(
                path=dec["_mask_path"],
                mass=dec["_mask_mass"],
                bounding_box_xywh=dec["_mask_bounding_box_xywh"],
            )
            if dec["_mask_path"] is not None
            else None
        )
        viewpoint = (
            ViewpointAnnotation(
                R=dec["_viewpoint_R"],
                T=dec["_viewpoint_T"],
                focal_length=dec["_viewpoint_focal_length"],
                principal_point=dec["_viewpoint_principal_point"],
                intrinsics_format=dec["_viewpoint_intrinsics_format"]
                or "ndc_norm_image_bounds",
            )
            if dec["_viewpoint_R"] is not None
            else None
        )
        return cls(
            sequence_name=dec["sequence_name"],
            frame_number=dec["frame_number"],
            frame_timestamp=dec["frame_timestamp"],
            image=image,
            depth=depth,
            mask=mask,
            viewpoint=viewpoint,
        )

    def as_co3d_dict(self) -> Dict[str, Any]:
        """CO3D-style nested dict as consumed by FrameDataBuilder."""
        d: Dict[str, Any] = {
            "sequence_name": self.sequence_name,
            "frame_number": self.frame_number,
            "frame_timestamp": self.frame_timestamp,
        }
        if self.image:
            d["image"] = {"path": self.image.path, "size": self.image.size}
        if self.depth:
            d["depth"] = {
                "path": self.depth.path,
                "scale_adjustment": self.depth.scale_adjustment,
                "mask_path": self.depth.mask_path,
            }
        if self.mask:
            d["mask"] = {
                "path": self.mask.path,
                "mass": self.mask.mass,
                "bounding_box_xywh": self.mask.bounding_box_xywh,
            }
        if self.viewpoint:
            d["viewpoint"] = {
                "R": self.viewpoint.R,
                "T": self.viewpoint.T,
                "focal_length": self.viewpoint.focal_length,
                "principal_point": self.viewpoint.principal_point,
                "intrinsics_format": self.viewpoint.intrinsics_format,
            }
        return d


@dataclasses.dataclass
class SqlSequenceAnnotation(Base):
    """One row of sequence_annots (reference orm_types.py:172)."""

    __tablename__ = "sequence_annots"

    sequence_name: str
    category: Optional[str] = None
    video: Optional[VideoAnnotation] = None
    point_cloud: Optional[PointCloudAnnotation] = None
    viewpoint_quality_score: Optional[float] = None

    def to_row(self) -> tuple:
        vid, pc = self.video, self.point_cloud
        return (
            self.sequence_name,
            self.category,
            vid.path if vid else None,
            vid.length if vid else None,
            pc.path if pc else None,
            pc.quality_score if pc else None,
            pc.n_points if pc else None,
            self.viewpoint_quality_score,
        )

    @classmethod
    def from_row(cls, row: tuple) -> "SqlSequenceAnnotation":
        (seq, cat, vpath, vlen, pcpath, pcq, pcn, vqs) = row
        return cls(
            sequence_name=seq,
            category=cat,
            video=VideoAnnotation(path=vpath, length=vlen)
            if vpath is not None
            else None,
            point_cloud=PointCloudAnnotation(
                path=pcpath, quality_score=pcq, n_points=pcn
            )
            if pcpath is not None
            else None,
            viewpoint_quality_score=vqs,
        )
