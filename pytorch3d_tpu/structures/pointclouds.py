"""Heterogeneous batches of point clouds as immutable JAX pytrees.

Parity target: reference `pytorch3d/structures/pointclouds.py:19`.
Same padded-first design as `Meshes`: points `(N, P, 3)` with per-cloud
counts; packed views are static reshapes with masks.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .utils import list_to_padded


@struct.dataclass
class Pointclouds:
    """A batch of N point clouds with up to P points each."""

    _points_padded: jnp.ndarray  # (N, P, 3)
    _num_points_per_cloud: jnp.ndarray  # (N,) int32
    _normals_padded: Optional[jnp.ndarray] = None  # (N, P, 3)
    _features_padded: Optional[jnp.ndarray] = None  # (N, P, C)

    @classmethod
    def create(
        cls,
        points: Union[Sequence[jnp.ndarray], jnp.ndarray],
        normals=None,
        features=None,
        num_points_per_cloud: Optional[jnp.ndarray] = None,
    ) -> "Pointclouds":
        if isinstance(points, (list, tuple)):
            np_ = jnp.asarray([p.shape[0] for p in points], dtype=jnp.int32)
            points_padded = list_to_padded([jnp.asarray(p, jnp.float32) for p in points])
            normals_padded = (
                list_to_padded([jnp.asarray(n, jnp.float32) for n in normals])
                if normals is not None
                else None
            )
            features_padded = (
                list_to_padded([jnp.asarray(f, jnp.float32) for f in features])
                if features is not None
                else None
            )
        else:
            points_padded = jnp.asarray(points, jnp.float32)
            if points_padded.ndim != 3 or points_padded.shape[-1] != 3:
                raise ValueError("points must be (N, P, 3)")
            np_ = (
                jnp.asarray(num_points_per_cloud, jnp.int32)
                if num_points_per_cloud is not None
                else jnp.full(
                    (points_padded.shape[0],), points_padded.shape[1], jnp.int32
                )
            )
            normals_padded = jnp.asarray(normals, jnp.float32) if normals is not None else None
            features_padded = (
                jnp.asarray(features, jnp.float32) if features is not None else None
            )
        return cls(
            _points_padded=points_padded,
            _num_points_per_cloud=np_,
            _normals_padded=normals_padded,
            _features_padded=features_padded,
        )

    def __len__(self) -> int:
        return self._points_padded.shape[0]

    @property
    def max_points(self) -> int:
        return self._points_padded.shape[1]

    def isempty(self) -> bool:
        return len(self) == 0 or self.max_points == 0

    def num_points_per_cloud(self) -> jnp.ndarray:
        return self._num_points_per_cloud

    # Padded views -------------------------------------------------------
    def points_padded(self) -> jnp.ndarray:
        return self._points_padded

    def normals_padded(self) -> Optional[jnp.ndarray]:
        return self._normals_padded

    def features_padded(self) -> Optional[jnp.ndarray]:
        return self._features_padded

    def points_padded_mask(self) -> jnp.ndarray:
        P = self.max_points
        return (
            jnp.arange(P, dtype=jnp.int32)[None, :]
            < self._num_points_per_cloud[:, None]
        )

    # Packed views --------------------------------------------------------
    def points_packed(self) -> jnp.ndarray:
        N, P, _ = self._points_padded.shape
        return self._points_padded.reshape(N * P, 3)

    def points_packed_mask(self) -> jnp.ndarray:
        return self.points_padded_mask().reshape(-1)

    def packed_to_cloud_idx(self) -> jnp.ndarray:
        N, P, _ = self._points_padded.shape
        return jnp.repeat(jnp.arange(N, dtype=jnp.int32), P)

    def cloud_to_packed_first_idx(self) -> jnp.ndarray:
        N, P, _ = self._points_padded.shape
        return jnp.arange(N, dtype=jnp.int32) * P

    def normals_packed(self) -> Optional[jnp.ndarray]:
        if self._normals_padded is None:
            return None
        N, P, _ = self._normals_padded.shape
        return self._normals_padded.reshape(N * P, 3)

    def features_packed(self) -> Optional[jnp.ndarray]:
        if self._features_padded is None:
            return None
        N, P, C = self._features_padded.shape
        return self._features_padded.reshape(N * P, C)

    # Functional updates --------------------------------------------------
    def update_padded(
        self, new_points_padded, new_normals_padded=None, new_features_padded=None
    ) -> "Pointclouds":
        if new_points_padded.shape != self._points_padded.shape:
            raise ValueError("new values must have the same shape as the current.")
        return self.replace(
            _points_padded=new_points_padded,
            _normals_padded=(
                new_normals_padded
                if new_normals_padded is not None
                else self._normals_padded
            ),
            _features_padded=(
                new_features_padded
                if new_features_padded is not None
                else self._features_padded
            ),
        )

    def offset(self, offsets_packed: jnp.ndarray) -> "Pointclouds":
        pts = self.points_packed()
        if offsets_packed.shape == (3,):
            offs = jnp.broadcast_to(offsets_packed, pts.shape)
        else:
            if offsets_packed.shape != pts.shape:
                raise ValueError("Offsets must have dimension (all_p, 3).")
            offs = offsets_packed
        return self.update_padded((pts + offs).reshape(self._points_padded.shape))

    def scale(self, scale) -> "Pointclouds":
        scale = jnp.asarray(scale, self._points_padded.dtype)
        if scale.ndim == 0:
            scale = jnp.full((len(self),), scale)
        return self.replace(_points_padded=self._points_padded * scale[:, None, None])

    def detach(self) -> "Pointclouds":
        return jax.lax.stop_gradient(self)

    def clone(self) -> "Pointclouds":
        return self

    def to(self, *args, **kwargs) -> "Pointclouds":
        return self

    def cpu(self) -> "Pointclouds":
        """Device shim (reference pointclouds.py:874); placement is
        managed by jax.device_put / shardings here."""
        return self

    def cuda(self) -> "Pointclouds":
        return self

    # List accessors (host-side; reference pointclouds.py:370-460) ---------
    def points_list(self):
        """Per-cloud (P_i, 3) arrays (reference pointclouds.py:370)."""
        counts = [int(n) for n in np.asarray(self._num_points_per_cloud)]
        return [self._points_padded[i, :n] for i, n in enumerate(counts)]

    def normals_list(self):
        """Per-cloud (P_i, 3) normals or None (reference :384)."""
        if self._normals_padded is None:
            return None
        counts = [int(n) for n in np.asarray(self._num_points_per_cloud)]
        return [self._normals_padded[i, :n] for i, n in enumerate(counts)]

    def features_list(self):
        """Per-cloud (P_i, C) features or None (reference :399)."""
        if self._features_padded is None:
            return None
        counts = [int(n) for n in np.asarray(self._num_points_per_cloud)]
        return [self._features_padded[i, :n] for i, n in enumerate(counts)]

    def split(self, split_sizes):
        """Split the batch into sub-batches (reference :745)."""
        if sum(int(s) for s in split_sizes) != len(self):
            raise ValueError("Split sizes must sum to the batch size.")
        out, start = [], 0
        for s in split_sizes:
            out.append(self[slice(start, start + int(s))])
            start += int(s)
        return out

    def padded_to_packed_idx(self) -> jnp.ndarray:
        """Map from packed position to padded flat index (reference
        :1006). Identity over all slots in this padded-first layout;
        compose with `points_packed_mask()` for validity."""
        N, P = self._points_padded.shape[:2]
        return jnp.arange(N * P, dtype=jnp.int32)

    def offset_(self, offsets_packed: jnp.ndarray) -> "Pointclouds":
        """Reference's in-place variant (pointclouds.py:766); arrays are
        immutable in JAX, so this RETURNS the updated Pointclouds."""
        return self.offset(offsets_packed)

    def scale_(self, scale) -> "Pointclouds":
        """Reference's in-place variant (pointclouds.py:793); returns the
        updated Pointclouds (JAX immutability)."""
        return self.scale(scale)

    # Batch manipulation ---------------------------------------------------
    def __getitem__(self, index) -> "Pointclouds":
        if isinstance(index, int):
            index = [index]
        if isinstance(index, (list, tuple)):
            index = jnp.asarray(index)
        return Pointclouds(
            _points_padded=self._points_padded[index],
            _num_points_per_cloud=self._num_points_per_cloud[index],
            _normals_padded=(
                self._normals_padded[index] if self._normals_padded is not None else None
            ),
            _features_padded=(
                self._features_padded[index]
                if self._features_padded is not None
                else None
            ),
        )

    def extend(self, N: int) -> "Pointclouds":
        if not isinstance(N, int) or N <= 0:
            raise ValueError("N must be > 0.")
        idx = jnp.repeat(jnp.arange(len(self)), N)
        return self[idx]

    def get_bounding_boxes(self) -> jnp.ndarray:
        mask = self.points_padded_mask()[..., None]
        big = jnp.asarray(jnp.inf, self._points_padded.dtype)
        mins = jnp.min(jnp.where(mask, self._points_padded, big), axis=1)
        maxs = jnp.max(jnp.where(mask, self._points_padded, -big), axis=1)
        return jnp.stack([mins, maxs], axis=-1)

    def get_cloud(self, index: int):
        """(points, normals, features) of cloud `index`, trimmed to count.

        Host-side convenience (dynamic shape) — do not call under jit.
        """
        n = int(self._num_points_per_cloud[index])
        pts = self._points_padded[index, :n]
        nrm = self._normals_padded[index, :n] if self._normals_padded is not None else None
        feat = (
            self._features_padded[index, :n] if self._features_padded is not None else None
        )
        return pts, nrm, feat

    def subsample(self, max_points: int, key: Optional[jax.Array] = None) -> "Pointclouds":
        """Randomly keep at most `max_points` per cloud (reference :925)."""
        if max_points >= self.max_points:
            return self
        if key is None:
            key = jax.random.PRNGKey(0)
        N, P, _ = self._points_padded.shape
        # Random permutation scores; invalid slots pushed to the end.
        scores = jax.random.uniform(key, (N, P))
        scores = jnp.where(self.points_padded_mask(), scores, 2.0)
        idx = jnp.argsort(scores, axis=1)[:, :max_points]  # (N, max_points)
        take = jax.vmap(lambda p, i: p[i])
        new_pts = take(self._points_padded, idx)
        new_nrm = (
            take(self._normals_padded, idx) if self._normals_padded is not None else None
        )
        new_feat = (
            take(self._features_padded, idx)
            if self._features_padded is not None
            else None
        )
        new_counts = jnp.minimum(self._num_points_per_cloud, max_points)
        return Pointclouds(
            _points_padded=new_pts,
            _num_points_per_cloud=new_counts,
            _normals_padded=new_nrm,
            _features_padded=new_feat,
        )

    def inside_box(self, box: jnp.ndarray) -> jnp.ndarray:
        """Bool mask of points inside axis-aligned boxes (reference :1204).

        box: (2, 3) or (N, 2, 3) min/max corners.
        Returns (N*P,) over packed points.
        """
        if box.ndim == 2:
            box = box[None]
        if box.shape[-2:] != (2, 3):
            raise ValueError("Input box must be of shape (2, 3) or (N, 2, 3).")
        pts = self._points_padded  # (N, P, 3)
        inside = jnp.all(
            (pts >= box[:, 0][:, None]) & (pts <= box[:, 1][:, None]), axis=-1
        )
        return inside.reshape(-1)

    def estimate_normals(
        self,
        neighborhood_size: int = 50,
        disambiguate_directions: bool = True,
        assign_to_self: bool = False,
    ):
        from ..ops.points_normals import estimate_pointcloud_normals

        normals = estimate_pointcloud_normals(
            self,
            neighborhood_size=neighborhood_size,
            disambiguate_directions=disambiguate_directions,
        )
        if assign_to_self:
            return self.replace(_normals_padded=normals)
        return normals


def join_pointclouds_as_batch(pointclouds: List[Pointclouds]) -> Pointclouds:
    """Concatenate several Pointclouds batches (reference :1247)."""
    P = max(p.max_points for p in pointclouds)

    def pad_to(x, fill=0.0):
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, P - x.shape[1])
        return jnp.pad(x, pad, constant_values=fill)

    pts = jnp.concatenate([pad_to(p._points_padded) for p in pointclouds])
    counts = jnp.concatenate([p._num_points_per_cloud for p in pointclouds])
    has_normals = all(p._normals_padded is not None for p in pointclouds)
    has_features = all(p._features_padded is not None for p in pointclouds)
    normals = (
        jnp.concatenate([pad_to(p._normals_padded) for p in pointclouds])
        if has_normals
        else None
    )
    features = (
        jnp.concatenate([pad_to(p._features_padded) for p in pointclouds])
        if has_features
        else None
    )
    return Pointclouds(
        _points_padded=pts,
        _num_points_per_cloud=counts,
        _normals_padded=normals,
        _features_padded=features,
    )


def join_pointclouds_as_scene(pointclouds: Pointclouds) -> Pointclouds:
    """Merge a batch into a single cloud (reference :1288).

    Valid points are compacted to the front (static capacity N*P).
    """
    N, P, _ = pointclouds._points_padded.shape
    mask = pointclouds.points_packed_mask()
    order = jnp.argsort(~mask, stable=True)
    pts = pointclouds.points_packed()[order][None]
    count = jnp.sum(mask).astype(jnp.int32)[None]
    normals = pointclouds.normals_packed()
    features = pointclouds.features_packed()
    return Pointclouds(
        _points_padded=pts,
        _num_points_per_cloud=count,
        _normals_padded=normals[order][None] if normals is not None else None,
        _features_padded=features[order][None] if features is not None else None,
    )
