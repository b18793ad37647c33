"""symeig3x3 module (reference common/workaround/symeig3x3.py).

The implementation lives in common/symeig3x3.py in this package; this
module mirrors the reference file layout.
"""

from ..symeig3x3 import symeig3x3  # noqa: F401
