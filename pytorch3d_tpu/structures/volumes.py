"""Batched dense voxel grids (parity: reference structures/volumes.py).

`Volumes` holds densities (N, C_d, D, H, W) and optional features
(N, C_f, D, H, W) plus a `VolumeLocator` mapping between local ([-1, 1]^3,
XYZ order with X=W, Y=H, Z=D, align_corners=True) and world coordinates:

    x_world = x_local * (volume_size_xyz - 1) * 0.5 * voxel_size - translation

Homogeneous batches only (all grids share one (D, H, W)); heterogeneous
volume batches in the reference are rare and can be represented as separate
objects — a deliberate simplification for static-shape XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import struct

from ..transforms import Scale, Transform3d, Translate


@struct.dataclass
class VolumeLocator:
    """Locations of voxel centers in local and world coordinates."""

    voxel_size: jnp.ndarray  # (N, 3) xyz sizes
    volume_translation: jnp.ndarray  # (N, 3) xyz translation of grid center
    grid_size: Tuple[int, int, int] = struct.field(pytree_node=False, default=(1, 1, 1))
    # grid_size is (D, H, W)

    @classmethod
    def create(
        cls,
        batch_size: int,
        grid_size: Tuple[int, int, int],
        voxel_size: Union[float, jnp.ndarray] = 1.0,
        volume_translation: Union[Tuple[float, float, float], jnp.ndarray] = (0, 0, 0),
    ) -> "VolumeLocator":
        vs = jnp.asarray(voxel_size, jnp.float32)
        if vs.ndim == 0:
            vs = jnp.full((batch_size, 3), vs)
        elif vs.ndim == 1 and vs.shape[0] == 3:
            vs = jnp.broadcast_to(vs, (batch_size, 3))
        elif vs.ndim == 1:
            vs = jnp.broadcast_to(vs[:, None], (batch_size, 3))
        vt = jnp.asarray(volume_translation, jnp.float32)
        if vt.ndim == 1:
            vt = jnp.broadcast_to(vt, (batch_size, 3))
        return cls(voxel_size=vs, volume_translation=vt, grid_size=tuple(grid_size))

    def _grid_size_xyz(self) -> jnp.ndarray:
        D, H, W = self.grid_size
        return jnp.asarray([W, H, D], jnp.float32)

    def get_local_to_world_coords_transform(self) -> Transform3d:
        grid_xyz = self._grid_size_xyz()
        scale = (grid_xyz - 1.0) * 0.5 * self.voxel_size  # (N, 3)
        # guard size-1 dims (scale 0 would be singular)
        scale = jnp.where(grid_xyz[None, :] > 1, scale, self.voxel_size * 0.5)
        return Scale(scale).compose(Translate(-self.volume_translation))

    def get_world_to_local_coords_transform(self) -> Transform3d:
        return self.get_local_to_world_coords_transform().inverse()

    def world_to_local_coords(self, points_3d_world: jnp.ndarray) -> jnp.ndarray:
        return self.get_world_to_local_coords_transform().transform_points(
            points_3d_world
        )

    def local_to_world_coords(self, points_3d_local: jnp.ndarray) -> jnp.ndarray:
        return self.get_local_to_world_coords_transform().transform_points(
            points_3d_local
        )

    def get_coord_grid(self, world_coordinates: bool = True) -> jnp.ndarray:
        """(N, D, H, W, 3) voxel-center coordinates (xyz order)."""
        N = self.voxel_size.shape[0]
        D, H, W = self.grid_size
        zs = jnp.linspace(-1.0, 1.0, D) if D > 1 else jnp.zeros((1,))
        ys = jnp.linspace(-1.0, 1.0, H) if H > 1 else jnp.zeros((1,))
        xs = jnp.linspace(-1.0, 1.0, W) if W > 1 else jnp.zeros((1,))
        Z, Y, X = jnp.meshgrid(zs, ys, xs, indexing="ij")
        grid = jnp.stack([X, Y, Z], axis=-1)  # (D, H, W, 3) xyz
        grid = jnp.broadcast_to(grid, (N, D, H, W, 3))
        if not world_coordinates:
            return grid
        flat = grid.reshape(N, D * H * W, 3)
        world = self.local_to_world_coords(flat)
        return world.reshape(N, D, H, W, 3)


@struct.dataclass
class Volumes:
    """Batch of dense voxel grids with densities and optional features."""

    _densities: jnp.ndarray  # (N, C_d, D, H, W)
    locator: VolumeLocator
    _features: Optional[jnp.ndarray] = None  # (N, C_f, D, H, W)

    @classmethod
    def create(
        cls,
        densities: jnp.ndarray,
        features: Optional[jnp.ndarray] = None,
        voxel_size: Union[float, jnp.ndarray] = 1.0,
        volume_translation=(0.0, 0.0, 0.0),
    ) -> "Volumes":
        densities = jnp.asarray(densities, jnp.float32)
        if densities.ndim != 5:
            raise ValueError("densities must be (N, C, D, H, W)")
        if features is not None:
            features = jnp.asarray(features, jnp.float32)
            if features.shape[0] != densities.shape[0] or features.shape[2:] != densities.shape[2:]:
                raise ValueError("features spatial dims must match densities")
        N = densities.shape[0]
        grid_size = tuple(int(s) for s in densities.shape[2:])
        locator = VolumeLocator.create(
            N, grid_size, voxel_size=voxel_size, volume_translation=volume_translation
        )
        return cls(_densities=densities, locator=locator, _features=features)

    def __len__(self) -> int:
        return self._densities.shape[0]

    def densities(self) -> jnp.ndarray:
        return self._densities

    def features(self) -> Optional[jnp.ndarray]:
        return self._features

    def get_grid_sizes(self) -> jnp.ndarray:
        N = len(self)
        return jnp.broadcast_to(
            jnp.asarray(self.locator.grid_size, jnp.int32), (N, 3)
        )

    def get_align_corners(self) -> bool:
        return True

    def update_padded(
        self, new_densities: jnp.ndarray, new_features: Optional[jnp.ndarray] = None
    ) -> "Volumes":
        return self.replace(
            _densities=new_densities,
            _features=new_features if new_features is not None else self._features,
        )

    def __getitem__(self, index) -> "Volumes":
        if isinstance(index, int):
            index = [index]
        if isinstance(index, (list, tuple)):
            index = jnp.asarray(index)
        return Volumes(
            _densities=self._densities[index],
            locator=VolumeLocator(
                voxel_size=self.locator.voxel_size[index],
                volume_translation=self.locator.volume_translation[index],
                grid_size=self.locator.grid_size,
            ),
            _features=self._features[index] if self._features is not None else None,
        )

    # Coordinate transforms delegate to the locator.
    def get_local_to_world_coords_transform(self) -> Transform3d:
        return self.locator.get_local_to_world_coords_transform()

    def get_world_to_local_coords_transform(self) -> Transform3d:
        return self.locator.get_world_to_local_coords_transform()

    def world_to_local_coords(self, points_3d_world: jnp.ndarray) -> jnp.ndarray:
        return self.locator.world_to_local_coords(points_3d_world)

    def local_to_world_coords(self, points_3d_local: jnp.ndarray) -> jnp.ndarray:
        return self.locator.local_to_world_coords(points_3d_local)

    def get_coord_grid(self, world_coordinates: bool = True) -> jnp.ndarray:
        return self.locator.get_coord_grid(world_coordinates=world_coordinates)

    def to(self, *args, **kwargs) -> "Volumes":
        return self

    def clone(self) -> "Volumes":
        return self

    def cpu(self) -> "Volumes":
        """Device shim (reference volumes.py:1107); placement is managed
        by jax.device_put / shardings here."""
        return self

    def cuda(self) -> "Volumes":
        return self

    def densities_list(self):
        """Per-volume density tensors (reference volumes.py:398). All
        volumes in this layout share one grid size, so these are views."""
        return [self.densities()[i] for i in range(len(self))]

    def features_list(self):
        """Per-volume feature tensors or None (reference volumes.py:406)."""
        feats = self.features()
        if feats is None:
            return None
        return [feats[i] for i in range(len(self))]
