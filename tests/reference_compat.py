"""Helper to import the reference pytorch3d's PURE-PYTHON modules for
numerical parity tests.

The reference lives read-only at /root/reference with no compiled `_C`
extension; a permissive stub satisfies module-level attribute accesses so
torch-only code paths (transforms, camera math, sample_pdf python, naive
marching cubes, ...) import cleanly.  Anything actually calling a native op
raises, which a test would catch.
"""

from __future__ import annotations

import sys
import types

_REF_PATH = "/root/reference"


class _NativeStubAttr:
    def __call__(self, *a, **k):  # pragma: no cover
        raise RuntimeError("reference native op is not available in tests")


class _NativeStub(types.ModuleType):
    MAX_UINT = 2**32 - 1

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _NativeStubAttr()


def _mesh_normal_consistency_find_verts(edge_num):
    """Pure-python equivalent of the reference native op
    (csrc/mesh_normal_consistency/mesh_normal_consistency_cpu.cpp:13):
    for each edge with e incident opposite-vertex rows (numbered
    consecutively), emit every (i, j) i<j pair of row ids."""
    import torch

    pairs = []
    start = 0
    for e in edge_num.tolist():
        for j in range(e):
            for i in range(j):
                pairs.append((start + i, start + j))
        start += e
    if not pairs:
        return torch.zeros((0, 2), dtype=torch.int64)
    return torch.tensor(pairs, dtype=torch.int64)


class _PathManager:
    """Minimal iopath.common.file_io.PathManager stand-in (local fs only)."""

    def open(self, path, mode="r", **kwargs):
        return open(path, mode)

    def exists(self, path):
        import os

        return os.path.exists(path)

    def get_local_path(self, path):
        return str(path)

    def isfile(self, path):
        import os

        return os.path.isfile(path)


def _install_iopath_stub():
    if "iopath" in sys.modules:
        return
    iopath = types.ModuleType("iopath")
    common = types.ModuleType("iopath.common")
    file_io = types.ModuleType("iopath.common.file_io")
    file_io.PathManager = _PathManager
    iopath.common = common
    common.file_io = file_io
    sys.modules["iopath"] = iopath
    sys.modules["iopath.common"] = common
    sys.modules["iopath.common.file_io"] = file_io


def import_reference():
    """Returns the reference `pytorch3d` package (or None if torch broken)."""
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    _install_iopath_stub()
    if "pytorch3d._C" not in sys.modules:
        stub = _NativeStub("pytorch3d._C")
        # explicit attributes win over __getattr__'s raising stub:
        stub.mesh_normal_consistency_find_verts = (
            _mesh_normal_consistency_find_verts
        )
        sys.modules["pytorch3d._C"] = stub
    import pytorch3d  # noqa: F401

    pytorch3d._C = sys.modules["pytorch3d._C"]
    return pytorch3d
