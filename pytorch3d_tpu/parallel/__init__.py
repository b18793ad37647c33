"""Multi-chip parallelism: meshes, shard_map rasterization, DDP steps (TPU-native; reference analog is DataParallel/Accelerate)."""
from .distributed import (
    PerProcessLoader,
    local_shard_indices,
    maybe_initialize_distributed,
)
from .implicitron import make_sharded_generic_train_step
from .mesh import (
    get_device_mesh,
    replicated,
    shard_batch,
    shard_pixels,
    shard_rays,
)
from .raster import (
    rasterize_fragments_shard_map,
    sharded_silhouette_loss_and_grad,
)
from .train import make_nerf_train_step, psum_grads

__all__ = [k for k in dir() if not k.startswith("_")]
