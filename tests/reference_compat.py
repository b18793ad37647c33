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


def _install_omegaconf_stub():
    """Minimal omegaconf so reference implicitron modules *import*;
    anything exercising the real OmegaConf API raises (a test would
    catch it)."""
    if "omegaconf" in sys.modules:
        return
    import contextlib

    om = types.ModuleType("omegaconf")

    class DictConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    class ListConfig(list):
        pass

    class OmegaConf:  # pragma: no cover - import-time names only
        def __getattr__(self, name):
            raise NotImplementedError(
                f"omegaconf stub: OmegaConf.{name} not available"
            )

        @staticmethod
        def create(obj=None):
            return DictConfig(obj or {})

    @contextlib.contextmanager
    def open_dict(cfg):
        yield cfg

    om.DictConfig = DictConfig
    om.ListConfig = ListConfig
    om.OmegaConf = OmegaConf
    om.open_dict = open_dict
    om.MISSING = "???"
    sys.modules["omegaconf"] = om


def import_reference_implicitron_module(name: str):
    """Import a reference `pytorch3d.implicitron.models.*` submodule while
    BYPASSING `pytorch3d/implicitron/models/__init__.py` (it imports
    GenericModel, whose class body runs the omegaconf-backed config
    machinery). A bare package shim stands in for the __init__; the leaf
    modules themselves only need omegaconf *names*, which the stub
    provides."""
    import importlib
    import os

    import_reference()
    _install_omegaconf_stub()
    base = "pytorch3d.implicitron.models"
    if base not in sys.modules:
        parent = importlib.import_module("pytorch3d.implicitron")
        mod = types.ModuleType(base)
        mod.__path__ = [
            os.path.join(_REF_PATH, "pytorch3d", "implicitron", "models")
        ]
        mod.__package__ = base
        sys.modules[base] = mod
        parent.models = mod
    return importlib.import_module(name)


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
