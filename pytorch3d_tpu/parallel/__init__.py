from .mesh import (
    get_device_mesh,
    replicated,
    shard_batch,
    shard_pixels,
    shard_rays,
)
from .train import make_nerf_train_step, psum_grads

__all__ = [k for k in dir() if not k.startswith("_")]
