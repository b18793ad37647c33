"""Heterogeneous batches of triangle meshes as immutable JAX pytrees.

Parity target: reference `pytorch3d/structures/meshes.py:17` (Meshes), but
re-designed for XLA:

- **Padded-first**: verts `(N, V, 3)` / faces `(N, F, 3)` with per-mesh
  counts; every derived quantity has a static shape + validity mask, so the
  whole structure jits, vmaps, and shards.
- **Packed views are reshapes**: mesh ``i``'s packed vertex offset is
  ``i * V``, so `verts_packed()` is `(N*V, 3)` with mask — no data-dependent
  concatenation (the reference's `_compute_packed`, meshes.py:960, gathers
  dynamically instead).
- **Edges by sort-dedup**: unique edges are computed with a lexsort +
  first-occurrence mask and compacted by rank scatter (static capacity
  ``3*N*F``), replacing the reference's dynamic `unique` (meshes.py:1036).
- **No lazy mutation**: derived quantities are pure functions; XLA CSE
  de-duplicates them inside a jit trace.

Padding conventions: verts padded with 0.0; faces padded with -1 (invalid).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .utils import list_to_padded


@struct.dataclass
class Meshes:
    """A batch of N triangle meshes with up to V verts / F faces each."""

    _verts_padded: jnp.ndarray  # (N, V, 3) float
    _faces_padded: jnp.ndarray  # (N, F, 3) int32, -1 padded
    _num_verts_per_mesh: jnp.ndarray  # (N,) int32
    _num_faces_per_mesh: jnp.ndarray  # (N,) int32
    textures: Optional[Any] = None

    # ------------------------------------------------------------------ #
    # Construction
    # ------------------------------------------------------------------ #
    @classmethod
    def create(
        cls,
        verts: Union[Sequence[jnp.ndarray], jnp.ndarray],
        faces: Union[Sequence[jnp.ndarray], jnp.ndarray],
        textures: Optional[Any] = None,
        num_verts_per_mesh: Optional[jnp.ndarray] = None,
        num_faces_per_mesh: Optional[jnp.ndarray] = None,
    ) -> "Meshes":
        """Build from lists of per-mesh arrays or already-padded tensors.

        Lists may be heterogeneous; padded tensors are (N, V, 3)/(N, F, 3).
        When padded tensors are given without counts, all meshes are assumed
        to use the full capacity (except faces rows containing -1).
        """
        if isinstance(verts, (list, tuple)):
            nv = jnp.asarray([v.shape[0] for v in verts], dtype=jnp.int32)
            verts_padded = (
                list_to_padded([jnp.asarray(v, jnp.float32) for v in verts])
                if len(verts) > 0
                else jnp.zeros((0, 0, 3), jnp.float32)
            )
        else:
            verts_padded = jnp.asarray(verts, jnp.float32)
            if verts_padded.ndim != 3 or verts_padded.shape[-1] != 3:
                raise ValueError("verts must be (N, V, 3)")
            nv = (
                jnp.asarray(num_verts_per_mesh, jnp.int32)
                if num_verts_per_mesh is not None
                else jnp.full((verts_padded.shape[0],), verts_padded.shape[1], jnp.int32)
            )
        if isinstance(faces, (list, tuple)):
            nf = jnp.asarray([f.shape[0] for f in faces], dtype=jnp.int32)
            faces_padded = (
                list_to_padded(
                    [jnp.asarray(f, jnp.int32) for f in faces], pad_value=-1
                )
                if len(faces) > 0
                else jnp.zeros((0, 0, 3), jnp.int32)
            )
        else:
            faces_padded = jnp.asarray(faces, jnp.int32)
            if faces_padded.ndim != 3 or faces_padded.shape[-1] != 3:
                raise ValueError("faces must be (N, F, 3)")
            if num_faces_per_mesh is not None:
                nf = jnp.asarray(num_faces_per_mesh, jnp.int32)
            else:
                nf = jnp.sum(
                    jnp.all(faces_padded >= 0, axis=-1), axis=-1
                ).astype(jnp.int32)
        if verts_padded.shape[0] != faces_padded.shape[0]:
            raise ValueError("verts and faces must have the same batch dimension")
        return cls(
            _verts_padded=verts_padded,
            _faces_padded=faces_padded,
            _num_verts_per_mesh=nv,
            _num_faces_per_mesh=nf,
            textures=textures,
        )

    # ------------------------------------------------------------------ #
    # Basic properties
    # ------------------------------------------------------------------ #
    def __len__(self) -> int:
        return self._verts_padded.shape[0]

    @property
    def max_verts(self) -> int:
        return self._verts_padded.shape[1]

    @property
    def max_faces(self) -> int:
        return self._faces_padded.shape[1]

    def isempty(self) -> bool:
        return len(self) == 0 or self.max_verts == 0

    def num_verts_per_mesh(self) -> jnp.ndarray:
        return self._num_verts_per_mesh

    def num_faces_per_mesh(self) -> jnp.ndarray:
        return self._num_faces_per_mesh

    # ------------------------------------------------------------------ #
    # Padded views
    # ------------------------------------------------------------------ #
    def verts_padded(self) -> jnp.ndarray:
        return self._verts_padded

    def faces_padded(self) -> jnp.ndarray:
        return self._faces_padded

    def verts_padded_mask(self) -> jnp.ndarray:
        """(N, V) bool — which padded vertex slots are real."""
        V = self.max_verts
        return (
            jnp.arange(V, dtype=jnp.int32)[None, :]
            < self._num_verts_per_mesh[:, None]
        )

    def faces_padded_mask(self) -> jnp.ndarray:
        """(N, F) bool — which padded face slots are real."""
        F = self.max_faces
        return (
            jnp.arange(F, dtype=jnp.int32)[None, :]
            < self._num_faces_per_mesh[:, None]
        )

    # ------------------------------------------------------------------ #
    # Packed views (static reshapes + masks)
    # ------------------------------------------------------------------ #
    def verts_packed(self) -> jnp.ndarray:
        """(N*V, 3) — mesh i occupies rows [i*V, (i+1)*V)."""
        N, V, _ = self._verts_padded.shape
        return self._verts_padded.reshape(N * V, 3)

    def verts_packed_mask(self) -> jnp.ndarray:
        return self.verts_padded_mask().reshape(-1)

    def verts_packed_to_mesh_idx(self) -> jnp.ndarray:
        N, V, _ = self._verts_padded.shape
        return jnp.repeat(jnp.arange(N, dtype=jnp.int32), V)

    def mesh_to_verts_packed_first_idx(self) -> jnp.ndarray:
        N, V, _ = self._verts_padded.shape
        return jnp.arange(N, dtype=jnp.int32) * V

    def faces_packed(self) -> jnp.ndarray:
        """(N*F, 3) faces with *global* packed vertex indices.

        Invalid (padding) faces are -1 rows (like the reference's exact
        packed tensors use no padding at all, every consumer here tests
        `faces >= 0`); gathers through them stay in-bounds because jax
        wraps negative indices.  Mask with `faces_packed_mask`.
        """
        N, F, _ = self._faces_padded.shape
        V = self.max_verts
        offsets = (jnp.arange(N, dtype=jnp.int32) * V)[:, None, None]
        faces = jnp.where(self._faces_padded >= 0, self._faces_padded, 0)
        packed = (faces + offsets).reshape(N * F, 3)
        return jnp.where(self.faces_packed_mask()[:, None], packed, -1)

    def faces_packed_mask(self) -> jnp.ndarray:
        return self.faces_padded_mask().reshape(-1)

    def faces_packed_to_mesh_idx(self) -> jnp.ndarray:
        N, F, _ = self._faces_padded.shape
        return jnp.repeat(jnp.arange(N, dtype=jnp.int32), F)

    def mesh_to_faces_packed_first_idx(self) -> jnp.ndarray:
        N, F, _ = self._faces_padded.shape
        return jnp.arange(N, dtype=jnp.int32) * F

    # ------------------------------------------------------------------ #
    # Edges (sort-dedup, static capacity 3*N*F)
    # ------------------------------------------------------------------ #
    def _compute_edges(self):
        faces = self.faces_packed()  # (NF, 3) global ids
        valid = self.faces_packed_mask()  # (NF,)
        NF = faces.shape[0]
        NV = self.verts_packed().shape[0]

        # Edge order per face matches the reference: (v1,v2), (v0,v2), (v0,v1).
        e12 = faces[:, 1:3]
        e02 = faces[:, 0:3:2]
        e01 = faces[:, 0:2]
        edges_all = jnp.concatenate([e12, e02, e01], axis=0)  # (3NF, 2)
        valid_all = jnp.tile(valid, 3)

        a = jnp.minimum(edges_all[:, 0], edges_all[:, 1])
        b = jnp.maximum(edges_all[:, 0], edges_all[:, 1])
        # Send invalid edges to a sentinel that sorts last.
        a = jnp.where(valid_all, a, NV)
        b = jnp.where(valid_all, b, NV)

        order = jnp.lexsort((b, a))  # primary key a, secondary b
        a_s, b_s = a[order], b[order]
        first = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]),
            ]
        )
        valid_s = a_s < NV
        uniq = first & valid_s
        ranks = jnp.cumsum(uniq) - 1  # rank of each sorted edge's unique id
        num_edges = jnp.sum(uniq).astype(jnp.int32)

        E_cap = 3 * NF
        # Compact unique edges into rank order; padding slots stay -1 so
        # consumers' `edges >= 0` validity tests hold (padding at 0 made
        # every vertex-0 degree count the pad edges — a real 1-4% error
        # in the uniform laplacian loss before this).
        scatter_idx = jnp.where(uniq, ranks, E_cap)
        edges_packed = (
            jnp.full((E_cap, 2), -1, jnp.int32)
            .at[scatter_idx]
            .set(jnp.stack([a_s, b_s], axis=-1), mode="drop")
        )
        edges_mask = jnp.arange(E_cap) < num_edges

        # Map each (face, slot) to its unique edge index.
        inverse = jnp.zeros((E_cap,), jnp.int32).at[order].set(ranks.astype(jnp.int32))
        faces_to_edges = jnp.stack(
            [inverse[0:NF], inverse[NF : 2 * NF], inverse[2 * NF :]], axis=1
        )
        return edges_packed, edges_mask, faces_to_edges, num_edges

    def edges_packed(self) -> jnp.ndarray:
        """(3*N*F, 2) unique edges (global vert ids), rank-compacted."""
        return self._compute_edges()[0]

    def edges_packed_mask(self) -> jnp.ndarray:
        return self._compute_edges()[1]

    def faces_packed_to_edges_packed(self) -> jnp.ndarray:
        """(N*F, 3): per-face unique-edge ids; column k is the edge opposite
        vertex k (reference ordering)."""
        return self._compute_edges()[2]

    def num_edges(self) -> jnp.ndarray:
        return self._compute_edges()[3]

    def edges_packed_to_mesh_idx(self) -> jnp.ndarray:
        V = self.max_verts
        edges, mask, _, _ = self._compute_edges()
        return jnp.where(mask, edges[:, 0] // V, -1).astype(jnp.int32)

    def num_edges_per_mesh(self) -> jnp.ndarray:
        N = len(self)
        idx = self.edges_packed_to_mesh_idx()
        mask = self.edges_packed_mask()
        return jax.ops.segment_sum(
            mask.astype(jnp.int32), jnp.where(mask, idx, 0), num_segments=N
        )

    # ------------------------------------------------------------------ #
    # Normals and areas
    # ------------------------------------------------------------------ #
    def faces_verts_packed(self) -> jnp.ndarray:
        """(N*F, 3, 3) — the three vertex positions of each packed face."""
        return self.verts_packed()[self.faces_packed()]

    def _face_areas_normals(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        fv = self.faces_verts_packed()
        v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
        n = jnp.cross(v1 - v0, v2 - v0)
        nn2 = jnp.sum(n * n, axis=-1, keepdims=True)
        # Degenerate faces (incl. padding, which gathers vertex 0 thrice)
        # get zero area/normal with zero — not NaN — gradients.
        degenerate = nn2 < 1e-20
        nn = jnp.sqrt(jnp.where(degenerate, 1.0, nn2))
        areas = jnp.where(degenerate[..., 0], 0.0, 0.5 * nn[..., 0])
        normals = jnp.where(degenerate, 0.0, n / nn)
        mask = self.faces_packed_mask()
        return (
            jnp.where(mask, areas, 0.0),
            jnp.where(mask[:, None], normals, 0.0),
        )

    def faces_areas_packed(self) -> jnp.ndarray:
        return self._face_areas_normals()[0]

    def faces_normals_packed(self) -> jnp.ndarray:
        return self._face_areas_normals()[1]

    def faces_normals_padded(self) -> jnp.ndarray:
        N, F, _ = self._faces_padded.shape
        return self.faces_normals_packed().reshape(N, F, 3)

    def verts_normals_packed(self) -> jnp.ndarray:
        """Area-weighted vertex normals (reference: meshes.py:884).

        Each face adds the same (unnormalized) face cross product to its
        three vertices; the sums are normalized.  Scatter-add is a
        `segment_sum` over packed vertex ids (XLA-native, no atomics).
        """
        verts = self.verts_packed()
        faces = self.faces_packed()
        mask = self.faces_packed_mask()
        fv = verts[faces]
        n = jnp.cross(fv[:, 2] - fv[:, 1], fv[:, 0] - fv[:, 1])
        n = jnp.where(mask[:, None], n, 0.0)
        NV = verts.shape[0]
        acc = jnp.zeros((NV, 3), verts.dtype)
        for k in range(3):
            acc = acc.at[faces[:, k]].add(n)
        nn2 = jnp.sum(acc * acc, axis=-1, keepdims=True)
        zero = nn2 < 1e-20
        return jnp.where(zero, 0.0, acc / jnp.sqrt(jnp.where(zero, 1.0, nn2)))

    def verts_normals_padded(self) -> jnp.ndarray:
        N, V, _ = self._verts_padded.shape
        return self.verts_normals_packed().reshape(N, V, 3)

    # ------------------------------------------------------------------ #
    # Updates (functional)
    # ------------------------------------------------------------------ #
    def update_padded(self, new_verts_padded: jnp.ndarray) -> "Meshes":
        """Replace vertex positions, keeping topology and textures."""
        if new_verts_padded.shape != self._verts_padded.shape:
            raise ValueError("new values must have the same shape as the current.")
        return self.replace(_verts_padded=new_verts_padded)

    def offset_verts(self, vert_offsets_packed: jnp.ndarray) -> "Meshes":
        """Translate verts by (N*V, 3) packed or (3,) global offsets."""
        verts = self.verts_packed()
        if vert_offsets_packed.shape == (3,):
            offs = jnp.broadcast_to(vert_offsets_packed, verts.shape)
        else:
            if vert_offsets_packed.shape != verts.shape:
                raise ValueError("Verts offsets must have dimension (all_v, 3).")
            offs = vert_offsets_packed
        new_packed = verts + offs
        return self.update_padded(new_packed.reshape(self._verts_padded.shape))

    def scale_verts(self, scale) -> "Meshes":
        """Scale each mesh by a scalar or an (N,) vector."""
        scale = jnp.asarray(scale, self._verts_padded.dtype)
        if scale.ndim == 0:
            scale = jnp.full((len(self),), scale)
        return self.replace(
            _verts_padded=self._verts_padded * scale[:, None, None]
        )

    def detach(self) -> "Meshes":
        return jax.lax.stop_gradient(self)

    def clone(self) -> "Meshes":
        return self

    def to(self, *args, **kwargs) -> "Meshes":
        return self

    def cpu(self) -> "Meshes":
        """Device shim (reference meshes.py:1327); placement is managed
        by jax.device_put / shardings in this framework."""
        return self

    def cuda(self) -> "Meshes":
        return self

    # ------------------------------------------------------------------ #
    # List accessors (host-side convenience; reference meshes.py:404-470
    # returns the list representation — here sliced views of the padded
    # tensors, so use outside jit)
    # ------------------------------------------------------------------ #
    def verts_list(self) -> List[jnp.ndarray]:
        """Per-mesh (V_i, 3) vertex arrays (reference meshes.py:404)."""
        counts = [int(n) for n in np.asarray(self._num_verts_per_mesh)]
        return [self._verts_padded[i, :n] for i, n in enumerate(counts)]

    def faces_list(self) -> List[jnp.ndarray]:
        """Per-mesh (F_i, 3) face arrays (reference meshes.py:418)."""
        counts = [int(n) for n in np.asarray(self._num_faces_per_mesh)]
        return [self._faces_padded[i, :n] for i, n in enumerate(counts)]

    def verts_normals_list(self) -> List[jnp.ndarray]:
        """Per-mesh (V_i, 3) vertex normals (reference meshes.py:624)."""
        normals = self.verts_normals_padded()
        counts = [int(n) for n in np.asarray(self._num_verts_per_mesh)]
        return [normals[i, :n] for i, n in enumerate(counts)]

    def faces_normals_list(self) -> List[jnp.ndarray]:
        """Per-mesh (F_i, 3) face normals (reference meshes.py:640)."""
        normals = self.faces_normals_padded()
        counts = [int(n) for n in np.asarray(self._num_faces_per_mesh)]
        return [normals[i, :n] for i, n in enumerate(counts)]

    def get_mesh_verts_faces(self, index: int):
        """(verts, faces) of one mesh, unpadded (reference meshes.py:1492)."""
        if not isinstance(index, int):
            raise ValueError("Mesh index must be an integer.")
        if index < 0 or index >= len(self):
            raise ValueError("Mesh index out of bounds.")
        nv = int(self._num_verts_per_mesh[index])
        nf = int(self._num_faces_per_mesh[index])
        return (
            self._verts_padded[index, :nv],
            self._faces_padded[index, :nf],
        )

    def split(self, split_sizes: List[int]) -> List["Meshes"]:
        """Split the batch into sub-batches of the given sizes
        (reference meshes.py:1451)."""
        if sum(int(s) for s in split_sizes) != len(self):
            raise ValueError(
                "Split sizes must sum to the batch size."
            )
        out, start = [], 0
        for s in split_sizes:
            out.append(self[slice(start, start + int(s))])
            start += int(s)
        return out

    def verts_padded_to_packed_idx(self) -> jnp.ndarray:
        """(sum(V_i),)-style map from packed position to padded flat index
        (reference meshes.py:823). In this padded-first layout the packed
        view is the flat padded view, so the map is the identity over all
        slots; compose with `verts_packed_mask()` for validity."""
        N, V = self._verts_padded.shape[:2]
        return jnp.arange(N * V, dtype=jnp.int32)

    def mesh_to_edges_packed_first_idx(self) -> jnp.ndarray:
        """(N,) first edge index per mesh in the packed edge tensor
        (reference meshes.py:736)."""
        self._compute_edges()
        num = self.num_edges_per_mesh()
        return jnp.concatenate(
            [jnp.zeros((1,), num.dtype), jnp.cumsum(num)[:-1]]
        )

    def laplacian_packed(self):
        """Uniform Laplacian over the packed verts as a sparse BCOO
        matrix (reference meshes.py:1577 returns torch sparse). Host-side
        (slices valid edges)."""
        from ..ops.laplacian_matrices import laplacian

        edges = self.edges_packed()
        valid = np.asarray(self.edges_packed_mask())
        return laplacian(self.verts_packed(), edges[valid])

    def offset_verts_(self, vert_offsets_packed: jnp.ndarray) -> "Meshes":
        """Reference's in-place variant (meshes.py:1239); arrays are
        immutable in JAX, so this RETURNS the updated Meshes."""
        return self.offset_verts(vert_offsets_packed)

    def scale_verts_(self, scale) -> "Meshes":
        """Reference's in-place variant (meshes.py:1296); returns the
        updated Meshes (JAX immutability)."""
        return self.scale_verts(scale)

    def check_shapes(self) -> bool:
        """Validate padded/count consistency (the reference validates in
        __init__, meshes.py:234; this layout is constructed from arrays
        so expose it as an explicit check)."""
        N = len(self)
        ok = (
            self._verts_padded.ndim == 3
            and self._verts_padded.shape[-1] == 3
            and self._faces_padded.ndim == 3
            and self._faces_padded.shape[-1] == 3
            and self._num_verts_per_mesh.shape == (N,)
            and self._num_faces_per_mesh.shape == (N,)
            and bool(
                jnp.all(
                    self._num_verts_per_mesh
                    <= self._verts_padded.shape[1]
                )
            )
            and bool(
                jnp.all(
                    self._num_faces_per_mesh
                    <= self._faces_padded.shape[1]
                )
            )
        )
        if not ok:
            raise ValueError("Meshes padded/count shapes are inconsistent.")
        return True

    # ------------------------------------------------------------------ #
    # Batch manipulation
    # ------------------------------------------------------------------ #
    def __getitem__(self, index) -> "Meshes":
        if isinstance(index, int):
            index = [index]
        if isinstance(index, (list, tuple)):
            index = jnp.asarray(index)
        if isinstance(index, slice):
            return Meshes(
                _verts_padded=self._verts_padded[index],
                _faces_padded=self._faces_padded[index],
                _num_verts_per_mesh=self._num_verts_per_mesh[index],
                _num_faces_per_mesh=self._num_faces_per_mesh[index],
                textures=self.textures[index] if self.textures is not None else None,
            )
        return Meshes(
            _verts_padded=self._verts_padded[index],
            _faces_padded=self._faces_padded[index],
            _num_verts_per_mesh=self._num_verts_per_mesh[index],
            _num_faces_per_mesh=self._num_faces_per_mesh[index],
            textures=self.textures[index] if self.textures is not None else None,
        )

    def extend(self, N: int) -> "Meshes":
        """Repeat each mesh N times (reference: meshes.py:1521)."""
        if not isinstance(N, int) or N <= 0:
            raise ValueError("N must be > 0.")
        idx = jnp.repeat(jnp.arange(len(self)), N)
        return self[idx]

    def get_bounding_boxes(self) -> jnp.ndarray:
        """(N, 3, 2) per-mesh min/max corners over valid verts."""
        mask = self.verts_padded_mask()[..., None]
        big = jnp.asarray(jnp.inf, self._verts_padded.dtype)
        mins = jnp.min(jnp.where(mask, self._verts_padded, big), axis=1)
        maxs = jnp.max(jnp.where(mask, self._verts_padded, -big), axis=1)
        return jnp.stack([mins, maxs], axis=-1)

    def has_verts_normals(self) -> bool:
        return True

    def sample_textures(self, fragments):
        if self.textures is None:
            raise ValueError("Meshes does not have textures")
        return self.textures.sample_textures(fragments, faces_packed=self.faces_packed())

    def submeshes(self, face_indices) -> "Meshes":
        """Extract sub-meshes given per-mesh lists of face-index arrays
        (reference meshes.py:1563).  Host-side: output sizes are
        data-dependent, so inputs must be concrete.

        face_indices: list (len N) of lists of 1D face-index arrays (local
        per-mesh face ids).  Returns one sub-mesh per inner array, in order.
        """
        import numpy as np

        if len(face_indices) != len(self):
            raise ValueError(
                "You must specify exactly one set of submeshes for each mesh "
                "in this Meshes object."
            )
        verts_padded = np.asarray(self.verts_padded())
        faces_padded = np.asarray(self.faces_padded())
        sub_verts, sub_faces = [], []
        for i, per_mesh in enumerate(face_indices):
            for idx in per_mesh:
                idx = np.asarray(idx).reshape(-1)
                faces = faces_padded[i][idx]  # (S, 3) local vert ids
                uniq, inverse = np.unique(faces.reshape(-1), return_inverse=True)
                sub_verts.append(
                    jnp.asarray(verts_padded[i][uniq], jnp.float32)
                )
                sub_faces.append(
                    jnp.asarray(inverse.reshape(-1, 3).astype(np.int32))
                )
        return Meshes.create(sub_verts, sub_faces)


def join_meshes_as_batch(meshes: List[Meshes], include_textures: bool = True) -> Meshes:
    """Concatenate several Meshes batches into one (reference meshes.py:1672)."""
    if isinstance(meshes, Meshes):
        raise ValueError("Wrong first argument to join_meshes_as_batch.")
    V = max(m.max_verts for m in meshes)
    F = max(m.max_faces for m in meshes)

    def pad_to(x, dim1, fill):
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, dim1 - x.shape[1])
        return jnp.pad(x, pad, constant_values=fill)

    verts = jnp.concatenate([pad_to(m._verts_padded, V, 0.0) for m in meshes])
    faces = jnp.concatenate([pad_to(m._faces_padded, F, -1) for m in meshes])
    nv = jnp.concatenate([m._num_verts_per_mesh for m in meshes])
    nf = jnp.concatenate([m._num_faces_per_mesh for m in meshes])
    tex = None
    if include_textures and all(m.textures is not None for m in meshes):
        first = meshes[0].textures
        tex = type(first).join_batch([m.textures for m in meshes])
    return Meshes(
        _verts_padded=verts,
        _faces_padded=faces,
        _num_verts_per_mesh=nv,
        _num_faces_per_mesh=nf,
        textures=tex,
    )


def join_meshes_as_scene(meshes, include_textures: bool = True) -> Meshes:
    """Merge a batch (or list) of meshes into a single scene mesh
    (meshes.py:1721; a list is first joined as a batch like the reference).

    Vertex indices are offset by each mesh's packed offset; padding faces
    are dropped by compacting valid faces to the front (host-free, static
    capacity sum of per-mesh capacities).
    """
    if isinstance(meshes, (list, tuple)):
        meshes = join_meshes_as_batch(
            list(meshes), include_textures=include_textures
        )
    N, V, _ = meshes._verts_padded.shape
    F = meshes.max_faces
    verts = meshes.verts_packed()[None]  # (1, N*V, 3)
    faces = meshes.faces_packed()
    fmask = meshes.faces_packed_mask()
    # Stable-compact valid faces to the front.
    order = jnp.argsort(~fmask, stable=True)
    faces_sorted = faces[order]
    fmask_sorted = fmask[order]
    faces_sorted = jnp.where(fmask_sorted[:, None], faces_sorted, -1)
    nv = jnp.asarray([N * V], jnp.int32)
    nf = jnp.sum(fmask).astype(jnp.int32)[None]
    tex = None
    if include_textures and meshes.textures is not None:
        # per-face texture data must follow the same compaction permutation
        tex = meshes.textures.join_scene(face_order=order)
    return Meshes(
        _verts_padded=verts,
        _faces_padded=faces_sorted[None],
        _num_verts_per_mesh=nv,
        _num_faces_per_mesh=nf,
        textures=tex,
    )
