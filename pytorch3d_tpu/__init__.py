"""pytorch3d_tpu — a TPU-native (JAX/XLA/Pallas) 3D deep-learning framework.

Capability surface mirrors facebookresearch/pytorch3d (reference layer map in
/root/repo/SURVEY.md), re-designed TPU-first:

- structures: immutable pytree batches of meshes / pointclouds / volumes
  (padded-first with validity masks; packed views are static reshapes).
- transforms: batched SO(3)/SE(3), rotation conversions, Transform3d.
- ops: KNN, chamfer, FPS, sampling, subdivision, marching cubes, ... as
  XLA-friendly jnp with Pallas kernels on the hot paths.
- renderer: differentiable mesh/point/implicit rendering.  The rasterizer is
  split TPU-style: an integer top-K face-selection pass (Pallas / jnp) plus a
  pure differentiable recomputation of barycentrics/z/dists, so backward is
  an XLA gather-transpose instead of atomic scatter.
- parallel: jax.sharding.Mesh based tile/ray sharding and psum gradient
  all-reduce (the DDP equivalent).
"""

__version__ = "0.1.0"
