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


def import_reference():
    """Returns the reference `pytorch3d` package (or None if torch broken)."""
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    if "pytorch3d._C" not in sys.modules:
        sys.modules["pytorch3d._C"] = _NativeStub("pytorch3d._C")
    import pytorch3d  # noqa: F401

    pytorch3d._C = sys.modules["pytorch3d._C"]
    return pytorch3d
