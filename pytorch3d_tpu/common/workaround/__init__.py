"""Numerical workarounds: symmetric eigendecomposition etc. (reference common/workaround)."""
from ..symeig3x3 import symeig3x3  # noqa: F401
from .utils import _safe_det_3x3  # noqa: F401
