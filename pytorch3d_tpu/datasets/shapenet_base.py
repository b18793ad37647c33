"""ShapeNetBase module (reference datasets/shapenet_base.py).

The class lives in datasets/shapenet/shapenet_core.py in this package;
this module mirrors the reference file layout.
"""

from .shapenet.shapenet_core import ShapeNetBase  # noqa: F401
