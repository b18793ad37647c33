"""Dataset loaders: ShapeNetCore, R2N2, collation (reference pytorch3d/datasets)."""
from .r2n2.r2n2 import R2N2
from .r2n2.utils import BlenderCamera, collate_batched_R2N2, read_binvox_coords
from .shapenet.shapenet_core import ShapeNetCore
from .utils import collate_batched_meshes

__all__ = [k for k in dir() if not k.startswith("_")]
