"""Device shims and small compatibility helpers (reference pytorch3d/common)."""
from .datatypes import Device, get_device, make_device
from .linear_with_repeat import LinearWithRepeat
from .math_utils import safe_norm, safe_normalize
from .symeig3x3 import symeig3x3

__all__ = [k for k in dir() if not k.startswith("_")]
