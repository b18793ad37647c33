"""ctypes bindings to the native OBJ parser (csrc/fast_io.cpp).

Compiled lazily with g++ on first use and cached next to the source; any
failure falls back to the pure-Python parser (obj_io.py), which is also the
correctness oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_SO_PATH = os.path.join(_CSRC, "libfast_io.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    src = os.path.join(_CSRC, "fast_io.cpp")
    if not os.path.isfile(src):
        return None
    if os.path.isfile(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return _SO_PATH
    except (subprocess.SubprocessError, OSError):
        return None


def _get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        for fn in ("obj_num_verts", "obj_num_faces", "obj_num_uvs",
                   "obj_num_normals"):
            getattr(lib, fn).restype = ctypes.c_size_t
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        for fn in ("obj_has_face_uvs", "obj_has_face_normals",
                   "obj_error"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.obj_error_line.restype = ctypes.c_long
        lib.obj_error_line.argtypes = [ctypes.c_void_p]
        for fn, ct in (
            ("obj_copy_verts", ctypes.c_float),
            ("obj_copy_uvs", ctypes.c_float),
            ("obj_copy_normals", ctypes.c_float),
            ("obj_copy_faces", ctypes.c_int32),
            ("obj_copy_face_uvs", ctypes.c_int32),
            ("obj_copy_face_normals", ctypes.c_int32),
        ):
            getattr(lib, fn).restype = None
            getattr(lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ct)
            ]
        lib.obj_free.restype = None
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


# error-code -> reference-style message (reference io/obj_io.py:479,
# :486, :393, :409 — same phrasing so callers can match on substrings)
_OBJ_ERRORS = {
    1: "Vertex does not have 3 values. Line: %d",
    2: "Texture does not have 2 values. Line: %d",
    3: "Normal does not have 3 values. Line: %d",
    4: "Face vertices can only have 3 properties. Line: %d",
    5: "Vertex properties are inconsistent. Line: %d",
}


def fast_parse_obj(text: bytes):
    """Parse OBJ text natively.

    Returns dict(verts (V,3) f32, faces (F,3) i32, uvs, normals,
    faces_uv, faces_n) (None entries when absent), or None if the native
    library is unavailable.  Raises ValueError on malformed input with
    the same message phrasing as the reference loader.
    """
    lib = _get_lib()
    if lib is None:
        return None
    h = lib.obj_parse(text, len(text))
    try:
        err = lib.obj_error(h)
        if err:
            msg = _OBJ_ERRORS.get(err, "Malformed OBJ. Line: %d")
            raise ValueError(msg % lib.obj_error_line(h))
        nv = lib.obj_num_verts(h)
        nf = lib.obj_num_faces(h)
        nuv = lib.obj_num_uvs(h)
        nn = lib.obj_num_normals(h)
        verts = np.empty((nv, 3), np.float32)
        faces = np.empty((nf, 3), np.int32)
        if nv:
            lib.obj_copy_verts(h, verts.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)))
        if nf:
            lib.obj_copy_faces(h, faces.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)))
        uvs = normals = faces_uv = faces_n = None
        if nuv:
            uvs = np.empty((nuv, 2), np.float32)
            lib.obj_copy_uvs(h, uvs.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)))
        if nn:
            normals = np.empty((nn, 3), np.float32)
            lib.obj_copy_normals(h, normals.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)))
        if lib.obj_has_face_uvs(h):
            faces_uv = np.empty((nf, 3), np.int32)
            lib.obj_copy_face_uvs(h, faces_uv.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)))
        if lib.obj_has_face_normals(h):
            faces_n = np.empty((nf, 3), np.int32)
            lib.obj_copy_face_normals(h, faces_n.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)))
        return {
            "verts": verts, "faces": faces, "uvs": uvs, "normals": normals,
            "faces_uv": faces_uv, "faces_n": faces_n,
        }
    finally:
        lib.obj_free(h)
