"""MTL material IO (reference io/mtl_io.py:494 `load_mtl`,
:24/:140 texture-atlas baking).

The implementation lives in io/obj_io.py in this package; this module
mirrors the reference file layout and exposes the public names.
"""

from .obj_io import _load_mtl as load_mtl  # noqa: F401
from .obj_io import make_material_atlas  # noqa: F401
from .obj_io import make_mesh_texture_atlas  # noqa: F401
