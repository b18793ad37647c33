"""Mesh/pointcloud file IO: OBJ, PLY, OFF, glTF, pluggable IO (reference pytorch3d/io)."""
from .obj_io import load_obj, load_objs_as_meshes, save_obj
from .off_io import load_off, save_off
from .pluggable import IO
from .ply_io import load_ply, save_ply

__all__ = [k for k in dir() if not k.startswith("_")]
