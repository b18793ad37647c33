"""R2N2 dataset: binvox voxels, Blender cameras, voxel rendering (reference datasets/r2n2)."""
