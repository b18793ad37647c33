"""Pluggable-format interfaces (reference io/pluggable_formats.py).

The classes live in io/pluggable.py in this package; this module
mirrors the reference file layout.
"""

from .pluggable import (  # noqa: F401
    MeshFormatInterpreter,
    PointcloudFormatInterpreter,
    endswith,
)
