"""Mesh textures (parity: reference renderer/mesh/textures.py).

Three texture types, all immutable pytrees with padded storage:

- `TexturesVertex` (ref :1718): per-vertex colors, barycentric-interpolated.
- `TexturesUV` (ref :706): per-vertex UVs into per-mesh texture maps,
  sampled with bilinear grid_sample (uv in [0,1], v=0 at the bottom).
- `TexturesAtlas` (ref :400): per-face RxR texture patch indexed by
  barycentrics (as produced by the OBJ loader's atlas baking).

`sample_textures(fragments, faces_packed=...)` returns texels
(N, H, W, K, C).
"""

from __future__ import annotations

import abc

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...ops.grid_sample import grid_sample
from ...ops.interp_face_attrs import interpolate_face_attributes
from ...structures.utils import list_to_padded


def _subset_counts(counts, index):
    """Subset a static per-mesh count tuple by a (host) index array."""
    if counts is None:
        return None
    import numpy as np

    return tuple(int(counts[int(i)]) for i in np.asarray(index))


class TexturesBase(abc.ABC):
    """Common interface of the texture classes (reference textures.py:81).
    The concrete classes here are flax struct dataclasses registered as
    virtual subclasses so `isinstance(tex, TexturesBase)` works."""

    def sample_textures(self, fragments, faces_packed=None):
        raise NotImplementedError

    def faces_verts_textures_packed(self, *args, **kwargs):
        raise NotImplementedError

    def join_batch(self, textures):
        raise NotImplementedError

    def join_scene(self, face_order=None):
        raise NotImplementedError


@struct.dataclass
class TexturesVertex:
    """Per-vertex color textures."""

    _verts_features_padded: jnp.ndarray  # (N, V, C)
    # per-mesh valid vertex counts, recorded when created from lists
    # (static so list accessors can unpad; None = all slots valid)
    _num_verts: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    @classmethod
    def create(cls, verts_features) -> "TexturesVertex":
        num = None
        if isinstance(verts_features, (list, tuple)):
            num = tuple(int(f.shape[0]) for f in verts_features)
            verts_features = list_to_padded(
                [jnp.asarray(f, jnp.float32) for f in verts_features]
            )
        else:
            verts_features = jnp.asarray(verts_features, jnp.float32)
        if verts_features.ndim != 3:
            raise ValueError("verts_features must be (N, V, C)")
        return cls(_verts_features_padded=verts_features, _num_verts=num)

    def verts_features_padded(self) -> jnp.ndarray:
        """(N, V, C) padded per-vertex features (reference :1818)."""
        return self._verts_features_padded

    def verts_features_list(self) -> List[jnp.ndarray]:
        """Per-mesh (V_i, C) features (reference :1808); host-side."""
        x = self._verts_features_padded
        counts = self._num_verts or (x.shape[1],) * x.shape[0]
        return [x[i, :n] for i, n in enumerate(counts)]

    def verts_features_packed(self) -> jnp.ndarray:
        N, V, C = self._verts_features_padded.shape
        return self._verts_features_padded.reshape(N * V, C)

    def faces_verts_textures_packed(self, faces_packed=None) -> jnp.ndarray:
        """(sum(F_i), 3, C) texture at each face vertex (reference
        :1927). `faces_packed` are packed vertex indices."""
        if faces_packed is None:
            raise ValueError(
                "TexturesVertex.faces_verts_textures_packed needs the "
                "mesh's faces_packed()."
            )
        feats = self.verts_features_packed()
        return feats[jnp.maximum(faces_packed, 0)]

    def extend(self, N: int) -> "TexturesVertex":
        """Repeat each texture N times (reference :1845)."""
        if not isinstance(N, int) or N <= 0:
            raise ValueError("N must be > 0.")
        idx = jnp.repeat(
            jnp.arange(self._verts_features_padded.shape[0]), N
        )
        num = (
            tuple(n for n in self._num_verts for _ in range(N))
            if self._num_verts
            else None
        )
        return self.replace(
            _verts_features_padded=self._verts_features_padded[idx],
            _num_verts=num,
        )

    def clone(self) -> "TexturesVertex":
        return self

    def detach(self) -> "TexturesVertex":
        return jax.lax.stop_gradient(self)

    def check_shapes(self) -> bool:
        if self._verts_features_padded.ndim != 3:
            raise ValueError("verts_features must be (N, V, C)")
        return True

    def submeshes(self, vertex_ids_list, faces_ids_list) -> "TexturesVertex":
        """Sub-texture selection matching Meshes.submeshes (reference
        :1888): one output texture per (mesh, vertex-id set)."""
        feats = self.verts_features_list()
        out = []
        for per_mesh_ids, f in zip(vertex_ids_list, feats):
            for ids in per_mesh_ids:
                out.append(f[jnp.asarray(ids)])
        return TexturesVertex.create(out)

    def sample_textures(self, fragments, faces_packed=None) -> jnp.ndarray:
        feats = self.verts_features_packed()
        faces_feats = feats[faces_packed]  # (F, 3, C)
        return interpolate_face_attributes(
            fragments.pix_to_face, fragments.bary_coords, faces_feats
        )

    def __getitem__(self, index):
        if isinstance(index, int):
            index = [index]
        if isinstance(index, (list, tuple)):
            index = jnp.asarray(index)
        return TexturesVertex(
            _verts_features_padded=self._verts_features_padded[index],
            _num_verts=_subset_counts(self._num_verts, index),
        )

    @classmethod
    def join_batch(cls, textures: List["TexturesVertex"]) -> "TexturesVertex":
        V = max(t._verts_features_padded.shape[1] for t in textures)

        def pad(x):
            return jnp.pad(x, ((0, 0), (0, V - x.shape[1]), (0, 0)))

        return cls(
            _verts_features_padded=jnp.concatenate(
                [pad(t._verts_features_padded) for t in textures]
            )
        )

    def join_scene(self, face_order=None) -> "TexturesVertex":
        # vertex features follow verts_packed; face compaction is irrelevant
        N, V, C = self._verts_features_padded.shape
        return TexturesVertex(
            _verts_features_padded=self._verts_features_padded.reshape(1, N * V, C)
        )


@struct.dataclass
class TexturesUV:
    """UV-mapped texture images."""

    _maps_padded: jnp.ndarray  # (N, Hm, Wm, C)
    _faces_uvs_padded: jnp.ndarray  # (N, F, 3) int32 into verts_uvs
    _verts_uvs_padded: jnp.ndarray  # (N, Vuv, 2)
    padding_mode: str = struct.field(pytree_node=False, default="border")
    align_corners: bool = struct.field(pytree_node=False, default=True)
    sampling_mode: str = struct.field(pytree_node=False, default="bilinear")
    # per-mesh valid counts, recorded when created from lists (static;
    # None = all padded slots valid)
    _num_faces: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )
    _num_verts_uvs: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    @classmethod
    def create(
        cls,
        maps,
        faces_uvs,
        verts_uvs,
        padding_mode: str = "border",
        align_corners: bool = True,
        sampling_mode: str = "bilinear",
    ) -> "TexturesUV":
        num_f = num_v = None
        if isinstance(maps, (list, tuple)):
            maps = jnp.stack([jnp.asarray(m, jnp.float32) for m in maps])
        else:
            maps = jnp.asarray(maps, jnp.float32)
        if isinstance(faces_uvs, (list, tuple)):
            num_f = tuple(int(jnp.asarray(f).shape[0]) for f in faces_uvs)
            faces_uvs = list_to_padded(
                [jnp.asarray(f, jnp.int32) for f in faces_uvs], pad_value=0
            )
        else:
            faces_uvs = jnp.asarray(faces_uvs, jnp.int32)
        if isinstance(verts_uvs, (list, tuple)):
            num_v = tuple(int(jnp.asarray(v).shape[0]) for v in verts_uvs)
            verts_uvs = list_to_padded(
                [jnp.asarray(v, jnp.float32) for v in verts_uvs]
            )
        else:
            verts_uvs = jnp.asarray(verts_uvs, jnp.float32)
        if maps.ndim != 4:
            raise ValueError("maps must be (N, H, W, C)")
        if not (
            maps.shape[0] == faces_uvs.shape[0] == verts_uvs.shape[0]
        ):
            raise ValueError(
                "maps, faces_uvs and verts_uvs must have the same batch"
                " dimension (reference textures.py TexturesUV.__init__)"
            )
        return cls(
            _maps_padded=maps,
            _faces_uvs_padded=faces_uvs,
            _verts_uvs_padded=verts_uvs,
            padding_mode=padding_mode,
            align_corners=align_corners,
            sampling_mode=sampling_mode,
            _num_faces=num_f,
            _num_verts_uvs=num_v,
        )

    # -- accessors (reference textures.py:1230-1310) ----------------------- #
    def maps_padded(self) -> jnp.ndarray:
        return self._maps_padded

    def maps_list(self) -> List[jnp.ndarray]:
        return [
            self._maps_padded[i] for i in range(self._maps_padded.shape[0])
        ]

    def faces_uvs_padded(self) -> jnp.ndarray:
        return self._faces_uvs_padded

    def faces_uvs_list(self) -> List[jnp.ndarray]:
        x = self._faces_uvs_padded
        counts = self._num_faces or (x.shape[1],) * x.shape[0]
        return [x[i, :n] for i, n in enumerate(counts)]

    def verts_uvs_padded(self) -> jnp.ndarray:
        return self._verts_uvs_padded

    def verts_uvs_list(self) -> List[jnp.ndarray]:
        x = self._verts_uvs_padded
        counts = self._num_verts_uvs or (x.shape[1],) * x.shape[0]
        return [x[i, :n] for i, n in enumerate(counts)]

    def maps_ids_padded(self):
        """Multiple-maps-per-mesh ids (reference :1260). This
        implementation uses one map per mesh, so None (the reference
        default for single-map textures)."""
        return None

    def maps_ids_list(self):
        return None

    def faces_verts_textures_packed(self) -> jnp.ndarray:
        """(sum(F_i), 3, C) texture sampled at each face vertex's UV
        (reference :1317)."""
        fuv = self.faces_verts_uvs_packed()  # (N*F, 3, 2)
        N = self._maps_padded.shape[0]
        F3 = fuv.shape[0] // N
        gx = fuv[..., 0] * 2.0 - 1.0
        gy = 1.0 - 2.0 * fuv[..., 1]
        grid = jnp.stack([gx, gy], axis=-1).reshape(N, F3 * 3, 1, 2)
        maps = jnp.moveaxis(self._maps_padded, -1, 1)
        texels = grid_sample(
            maps,
            grid,
            mode=self.sampling_mode,
            padding_mode=self.padding_mode,
            align_corners=self.align_corners,
        )  # (N, C, F3*3, 1)
        C = texels.shape[1]
        out = jnp.moveaxis(texels[..., 0], 1, -1)  # (N, F3*3, C)
        return out.reshape(N * F3, 3, C)

    def centers_for_image(self, index: int) -> jnp.ndarray:
        """(V, 2) texture-image pixel coordinates of verts_uvs for one
        mesh, for visualization (reference :1609)."""
        if self._maps_padded.shape[0] != 1:
            raise ValueError(
                "This function only supports plotting textures for one mesh."
            )
        texture_image = self._maps_padded
        verts_uvs = self.verts_uvs_list()[index]
        _, H, W, _ = texture_image.shape
        u = verts_uvs[:, 0] * (W - 1)
        v = (1.0 - verts_uvs[:, 1]) * (H - 1)
        return jnp.stack([u, v], axis=1)

    def extend(self, N: int) -> "TexturesUV":
        if not isinstance(N, int) or N <= 0:
            raise ValueError("N must be > 0.")
        idx = jnp.repeat(jnp.arange(self._maps_padded.shape[0]), N)

        def rep(c):
            return tuple(n for n in c for _ in range(N)) if c else None

        return self.replace(
            _maps_padded=self._maps_padded[idx],
            _faces_uvs_padded=self._faces_uvs_padded[idx],
            _verts_uvs_padded=self._verts_uvs_padded[idx],
            _num_faces=rep(self._num_faces),
            _num_verts_uvs=rep(self._num_verts_uvs),
        )

    def clone(self) -> "TexturesUV":
        return self

    def detach(self) -> "TexturesUV":
        return jax.lax.stop_gradient(self)

    def check_shapes(self) -> bool:
        ok = (
            self._maps_padded.ndim == 4
            and self._faces_uvs_padded.ndim == 3
            and self._faces_uvs_padded.shape[-1] == 3
            and self._verts_uvs_padded.ndim == 3
            and self._verts_uvs_padded.shape[-1] == 2
            and self._maps_padded.shape[0]
            == self._faces_uvs_padded.shape[0]
            == self._verts_uvs_padded.shape[0]
        )
        if not ok:
            raise ValueError("TexturesUV shapes are inconsistent.")
        return True

    def submeshes(self, vertex_ids_list, faces_ids_list) -> "TexturesUV":
        """Sub-texture selection matching Meshes.submeshes (reference
        :1661): keeps each submesh's faces' UV rows, reindexing
        verts_uvs to the used subset. Host-side."""
        import numpy as np

        fl = self.faces_uvs_list()
        vl = self.verts_uvs_list()
        ml = self.maps_list()
        maps, faces_out, verts_out = [], [], []
        for mesh_i, per_mesh_fids in enumerate(faces_ids_list):
            for fids in per_mesh_fids:
                f = np.asarray(fl[mesh_i])[np.asarray(fids)]
                used, inv = np.unique(f.reshape(-1), return_inverse=True)
                faces_out.append(jnp.asarray(inv.reshape(f.shape), jnp.int32))
                verts_out.append(jnp.asarray(np.asarray(vl[mesh_i])[used]))
                maps.append(ml[mesh_i])
        return TexturesUV.create(
            maps=maps,
            faces_uvs=faces_out,
            verts_uvs=verts_out,
            padding_mode=self.padding_mode,
            align_corners=self.align_corners,
            sampling_mode=self.sampling_mode,
        )

    def faces_verts_uvs_packed(self) -> jnp.ndarray:
        """(N*F, 3, 2) uv coordinates of each face's three vertices."""
        take = jax.vmap(lambda uvs, f: uvs[f])
        fuv = take(self._verts_uvs_padded, self._faces_uvs_padded)  # (N, F, 3, 2)
        N, F = fuv.shape[:2]
        return fuv.reshape(N * F, 3, 2)

    def sample_textures(self, fragments, faces_packed=None) -> jnp.ndarray:
        """Interpolate per-pixel UVs then bilinearly sample the maps."""
        N, H_out, W_out, K = fragments.pix_to_face.shape
        pixel_uvs = interpolate_face_attributes(
            fragments.pix_to_face, fragments.bary_coords, self.faces_verts_uvs_packed()
        )  # (N, H, W, K, 2)
        # uv in [0,1] (v up) -> grid coords: x = 2u-1, y = 1-2v.
        gx = pixel_uvs[..., 0] * 2.0 - 1.0
        gy = 1.0 - 2.0 * pixel_uvs[..., 1]
        grid = jnp.stack([gx, gy], axis=-1).reshape(N, H_out, W_out * K, 2)
        maps = jnp.moveaxis(self._maps_padded, -1, 1)  # (N, C, Hm, Wm)
        texels = grid_sample(
            maps,
            grid,
            mode=self.sampling_mode,
            padding_mode=self.padding_mode,
            align_corners=self.align_corners,
        )  # (N, C, H, W*K)
        C = texels.shape[1]
        texels = texels.reshape(N, C, H_out, W_out, K)
        return jnp.moveaxis(texels, 1, -1)  # (N, H, W, K, C)

    def __getitem__(self, index):
        if isinstance(index, int):
            index = [index]
        if isinstance(index, (list, tuple)):
            index = jnp.asarray(index)
        return self.replace(
            _maps_padded=self._maps_padded[index],
            _faces_uvs_padded=self._faces_uvs_padded[index],
            _verts_uvs_padded=self._verts_uvs_padded[index],
            _num_faces=_subset_counts(self._num_faces, index),
            _num_verts_uvs=_subset_counts(self._num_verts_uvs, index),
        )

    def join_scene(self, face_order=None) -> "TexturesUV":
        """Merge the batch into one texture: maps packed horizontally, UVs
        offset into the packed atlas (reference textures.py join_scene).

        `face_order` is the packed-face permutation applied by
        `join_meshes_as_scene` when it compacts valid faces to the front —
        per-face uv rows must follow it to stay aligned with pix_to_face.
        """
        import jax.numpy as jnp

        N, Hm, Wm, C = self._maps_padded.shape
        packed = jnp.concatenate(
            [self._maps_padded[i] for i in range(N)], axis=1
        )[None]  # (1, Hm, N*Wm, C)
        # Clamp u half a texel inside each submap before packing so the
        # bilinear support never straddles into the adjacent mesh's map
        # (the reference refuses multi-map join_scene rather than bleed).
        half_texel = 0.5 / max(Wm - 1, 1)
        new_uvs = []
        for i in range(N):
            uv = self._verts_uvs_padded[i]
            u = (jnp.clip(uv[:, 0], half_texel, 1.0 - half_texel) + i) / N
            new_uvs.append(jnp.stack([u, uv[:, 1]], axis=1))
        verts_uvs = jnp.concatenate(new_uvs, axis=0)[None]
        Vuv = self._verts_uvs_padded.shape[1]
        offsets = (jnp.arange(N, dtype=jnp.int32) * Vuv)[:, None, None]
        faces_uvs = (self._faces_uvs_padded + offsets).reshape(1, -1, 3)
        if face_order is not None:
            faces_uvs = faces_uvs[:, face_order]
        return TexturesUV(
            _maps_padded=packed,
            _faces_uvs_padded=faces_uvs,
            _verts_uvs_padded=verts_uvs,
            padding_mode=self.padding_mode,
            align_corners=self.align_corners,
            sampling_mode=self.sampling_mode,
        )

    @classmethod
    def join_batch(cls, textures: List["TexturesUV"]) -> "TexturesUV":
        first = textures[0]
        Hm = max(t._maps_padded.shape[1] for t in textures)
        Wm = max(t._maps_padded.shape[2] for t in textures)
        F = max(t._faces_uvs_padded.shape[1] for t in textures)
        V = max(t._verts_uvs_padded.shape[1] for t in textures)

        def pad_map(x):
            return jnp.pad(
                x, ((0, 0), (0, Hm - x.shape[1]), (0, Wm - x.shape[2]), (0, 0))
            )

        def pad1(x, D):
            return jnp.pad(x, ((0, 0), (0, D - x.shape[1])) + ((0, 0),) * (x.ndim - 2))

        return cls(
            _maps_padded=jnp.concatenate([pad_map(t._maps_padded) for t in textures]),
            _faces_uvs_padded=jnp.concatenate(
                [pad1(t._faces_uvs_padded, F) for t in textures]
            ),
            _verts_uvs_padded=jnp.concatenate(
                [pad1(t._verts_uvs_padded, V) for t in textures]
            ),
            padding_mode=first.padding_mode,
            align_corners=first.align_corners,
            sampling_mode=first.sampling_mode,
        )


@struct.dataclass
class TexturesAtlas:
    """Per-face RxR texture atlas."""

    _atlas_padded: jnp.ndarray  # (N, F, R, R, C)
    _num_faces: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    @classmethod
    def create(cls, atlas) -> "TexturesAtlas":
        num = None
        if isinstance(atlas, (list, tuple)):
            num = tuple(int(jnp.asarray(a).shape[0]) for a in atlas)
            atlas = list_to_padded([jnp.asarray(a, jnp.float32) for a in atlas])
        else:
            atlas = jnp.asarray(atlas, jnp.float32)
        if atlas.ndim != 5:
            raise ValueError("atlas must be (N, F, R, R, C)")
        return cls(_atlas_padded=atlas, _num_faces=num)

    def atlas_padded(self) -> jnp.ndarray:
        """(N, F, R, R, C) padded atlas (reference :532)."""
        return self._atlas_padded

    def atlas_list(self) -> List[jnp.ndarray]:
        """Per-mesh (F_i, R, R, C) atlases (reference :524); host-side."""
        x = self._atlas_padded
        counts = self._num_faces or (x.shape[1],) * x.shape[0]
        return [x[i, :n] for i, n in enumerate(counts)]

    def faces_verts_textures_packed(self) -> jnp.ndarray:
        """(sum(F_i), 3, C) per-face-vertex texture: the atlas texels at
        barycentric corners (1,0), (0,1), (0,0) (reference :646)."""
        atlas_packed = self.atlas_packed()
        t0 = atlas_packed[:, 0, -1]
        t1 = atlas_packed[:, -1, 0]
        t2 = atlas_packed[:, 0, 0]
        return jnp.stack([t0, t1, t2], axis=1)

    def extend(self, N: int) -> "TexturesAtlas":
        if not isinstance(N, int) or N <= 0:
            raise ValueError("N must be > 0.")
        idx = jnp.repeat(jnp.arange(self._atlas_padded.shape[0]), N)
        num = (
            tuple(n for n in self._num_faces for _ in range(N))
            if self._num_faces
            else None
        )
        return self.replace(
            _atlas_padded=self._atlas_padded[idx], _num_faces=num
        )

    def clone(self) -> "TexturesAtlas":
        return self

    def detach(self) -> "TexturesAtlas":
        return jax.lax.stop_gradient(self)

    def check_shapes(self) -> bool:
        if self._atlas_padded.ndim != 5:
            raise ValueError("atlas must be (N, F, R, R, C)")
        return True

    def submeshes(self, vertex_ids_list, faces_ids_list) -> "TexturesAtlas":
        """Sub-texture selection matching Meshes.submeshes
        (reference :621); host-side."""
        al = self.atlas_list()
        out = []
        for mesh_i, per_mesh_fids in enumerate(faces_ids_list):
            for fids in per_mesh_fids:
                out.append(al[mesh_i][jnp.asarray(fids)])
        return TexturesAtlas.create(out)

    def atlas_packed(self) -> jnp.ndarray:
        N, F = self._atlas_padded.shape[:2]
        return self._atlas_padded.reshape((N * F,) + self._atlas_padded.shape[2:])

    def sample_textures(self, fragments, faces_packed=None) -> jnp.ndarray:
        atlas = self.atlas_packed()  # (F, R, R, C)
        R = atlas.shape[1]
        sel = jnp.maximum(fragments.pix_to_face, 0)
        if R == 1:
            texels = atlas[sel, 0, 0]
        else:
            bary = fragments.bary_coords[..., :2]
            w_xy = jnp.clip((bary * R).astype(jnp.int32), 0, R - 1)
            below_diag = (
                jnp.sum(bary, axis=-1) * R - jnp.sum(w_xy.astype(bary.dtype), axis=-1)
            ) <= 1.0
            w_x = jnp.where(below_diag, w_xy[..., 0], R - 1 - w_xy[..., 0])
            w_y = jnp.where(below_diag, w_xy[..., 1], R - 1 - w_xy[..., 1])
            texels = atlas[sel, w_y, w_x]
        mask = (fragments.pix_to_face >= 0)[..., None]
        return jnp.where(mask, texels, 0.0)

    def __getitem__(self, index):
        if isinstance(index, int):
            index = [index]
        if isinstance(index, (list, tuple)):
            index = jnp.asarray(index)
        return TexturesAtlas(
            _atlas_padded=self._atlas_padded[index],
            _num_faces=_subset_counts(self._num_faces, index),
        )

    def join_scene(self, face_order=None) -> "TexturesAtlas":
        """Merge the batch into one per-face atlas, following the packed-face
        compaction permutation of `join_meshes_as_scene` (reference
        textures.py TexturesAtlas.join_scene)."""
        atlas = self.atlas_packed()  # (N*F, R, R, C)
        if face_order is not None:
            atlas = atlas[face_order]
        return TexturesAtlas(_atlas_padded=atlas[None])

    @classmethod
    def join_batch(cls, textures: List["TexturesAtlas"]) -> "TexturesAtlas":
        F = max(t._atlas_padded.shape[1] for t in textures)

        def pad(x):
            return jnp.pad(
                x, ((0, 0), (0, F - x.shape[1])) + ((0, 0),) * (x.ndim - 2)
            )

        return cls(
            _atlas_padded=jnp.concatenate([pad(t._atlas_padded) for t in textures])
        )


def Textures(maps=None, faces_uvs=None, verts_uvs=None, verts_rgb=None):
    """DEPRECATED factory kept for reference API compatibility
    (reference renderer/mesh/textures.py:356): dispatches to TexturesUV
    (all of maps/faces_uvs/verts_uvs given) or TexturesVertex
    (verts_rgb given)."""
    import warnings

    warnings.warn(
        "Textures is deprecated; use TexturesUV, TexturesAtlas, or "
        "TexturesVertex instead.",
        PendingDeprecationWarning,
        stacklevel=2,
    )
    if faces_uvs is not None and verts_uvs is not None and maps is not None:
        return TexturesUV.create(
            maps=maps, faces_uvs=faces_uvs, verts_uvs=verts_uvs
        )
    if verts_rgb is not None:
        return TexturesVertex.create(verts_rgb)
    raise ValueError(
        "Textures either requires all three of (faces uvs, verts uvs, maps)"
        " or verts rgb"
    )


# register the struct-dataclass textures as virtual TexturesBase subclasses
for _cls in (TexturesVertex, TexturesUV, TexturesAtlas):
    TexturesBase.register(_cls)
