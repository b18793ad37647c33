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

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ...ops.grid_sample import grid_sample
from ...ops.interp_face_attrs import interpolate_face_attributes
from ...structures.utils import list_to_padded


@struct.dataclass
class TexturesVertex:
    """Per-vertex color textures."""

    verts_features_padded: jnp.ndarray  # (N, V, C)

    @classmethod
    def create(cls, verts_features) -> "TexturesVertex":
        if isinstance(verts_features, (list, tuple)):
            verts_features = list_to_padded(
                [jnp.asarray(f, jnp.float32) for f in verts_features]
            )
        else:
            verts_features = jnp.asarray(verts_features, jnp.float32)
        if verts_features.ndim != 3:
            raise ValueError("verts_features must be (N, V, C)")
        return cls(verts_features_padded=verts_features)

    def verts_features_packed(self) -> jnp.ndarray:
        N, V, C = self.verts_features_padded.shape
        return self.verts_features_padded.reshape(N * V, C)

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
        return TexturesVertex(verts_features_padded=self.verts_features_padded[index])

    @classmethod
    def join_batch(cls, textures: List["TexturesVertex"]) -> "TexturesVertex":
        V = max(t.verts_features_padded.shape[1] for t in textures)

        def pad(x):
            return jnp.pad(x, ((0, 0), (0, V - x.shape[1]), (0, 0)))

        return cls(
            verts_features_padded=jnp.concatenate(
                [pad(t.verts_features_padded) for t in textures]
            )
        )

    def join_scene(self, face_order=None) -> "TexturesVertex":
        # vertex features follow verts_packed; face compaction is irrelevant
        N, V, C = self.verts_features_padded.shape
        return TexturesVertex(
            verts_features_padded=self.verts_features_padded.reshape(1, N * V, C)
        )


@struct.dataclass
class TexturesUV:
    """UV-mapped texture images."""

    maps_padded: jnp.ndarray  # (N, Hm, Wm, C)
    faces_uvs_padded: jnp.ndarray  # (N, F, 3) int32 into verts_uvs
    verts_uvs_padded: jnp.ndarray  # (N, Vuv, 2)
    padding_mode: str = struct.field(pytree_node=False, default="border")
    align_corners: bool = struct.field(pytree_node=False, default=True)
    sampling_mode: str = struct.field(pytree_node=False, default="bilinear")

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
        if isinstance(maps, (list, tuple)):
            maps = jnp.stack([jnp.asarray(m, jnp.float32) for m in maps])
        else:
            maps = jnp.asarray(maps, jnp.float32)
        if isinstance(faces_uvs, (list, tuple)):
            faces_uvs = list_to_padded(
                [jnp.asarray(f, jnp.int32) for f in faces_uvs], pad_value=0
            )
        else:
            faces_uvs = jnp.asarray(faces_uvs, jnp.int32)
        if isinstance(verts_uvs, (list, tuple)):
            verts_uvs = list_to_padded(
                [jnp.asarray(v, jnp.float32) for v in verts_uvs]
            )
        else:
            verts_uvs = jnp.asarray(verts_uvs, jnp.float32)
        return cls(
            maps_padded=maps,
            faces_uvs_padded=faces_uvs,
            verts_uvs_padded=verts_uvs,
            padding_mode=padding_mode,
            align_corners=align_corners,
            sampling_mode=sampling_mode,
        )

    def faces_verts_uvs_packed(self) -> jnp.ndarray:
        """(N*F, 3, 2) uv coordinates of each face's three vertices."""
        take = jax.vmap(lambda uvs, f: uvs[f])
        fuv = take(self.verts_uvs_padded, self.faces_uvs_padded)  # (N, F, 3, 2)
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
        maps = jnp.moveaxis(self.maps_padded, -1, 1)  # (N, C, Hm, Wm)
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
            maps_padded=self.maps_padded[index],
            faces_uvs_padded=self.faces_uvs_padded[index],
            verts_uvs_padded=self.verts_uvs_padded[index],
        )

    def join_scene(self, face_order=None) -> "TexturesUV":
        """Merge the batch into one texture: maps packed horizontally, UVs
        offset into the packed atlas (reference textures.py join_scene).

        `face_order` is the packed-face permutation applied by
        `join_meshes_as_scene` when it compacts valid faces to the front —
        per-face uv rows must follow it to stay aligned with pix_to_face.
        """
        import jax.numpy as jnp

        N, Hm, Wm, C = self.maps_padded.shape
        packed = jnp.concatenate(
            [self.maps_padded[i] for i in range(N)], axis=1
        )[None]  # (1, Hm, N*Wm, C)
        # Clamp u half a texel inside each submap before packing so the
        # bilinear support never straddles into the adjacent mesh's map
        # (the reference refuses multi-map join_scene rather than bleed).
        half_texel = 0.5 / max(Wm - 1, 1)
        new_uvs = []
        for i in range(N):
            uv = self.verts_uvs_padded[i]
            u = (jnp.clip(uv[:, 0], half_texel, 1.0 - half_texel) + i) / N
            new_uvs.append(jnp.stack([u, uv[:, 1]], axis=1))
        verts_uvs = jnp.concatenate(new_uvs, axis=0)[None]
        Vuv = self.verts_uvs_padded.shape[1]
        offsets = (jnp.arange(N, dtype=jnp.int32) * Vuv)[:, None, None]
        faces_uvs = (self.faces_uvs_padded + offsets).reshape(1, -1, 3)
        if face_order is not None:
            faces_uvs = faces_uvs[:, face_order]
        return TexturesUV(
            maps_padded=packed,
            faces_uvs_padded=faces_uvs,
            verts_uvs_padded=verts_uvs,
            padding_mode=self.padding_mode,
            align_corners=self.align_corners,
            sampling_mode=self.sampling_mode,
        )

    @classmethod
    def join_batch(cls, textures: List["TexturesUV"]) -> "TexturesUV":
        first = textures[0]
        Hm = max(t.maps_padded.shape[1] for t in textures)
        Wm = max(t.maps_padded.shape[2] for t in textures)
        F = max(t.faces_uvs_padded.shape[1] for t in textures)
        V = max(t.verts_uvs_padded.shape[1] for t in textures)

        def pad_map(x):
            return jnp.pad(
                x, ((0, 0), (0, Hm - x.shape[1]), (0, Wm - x.shape[2]), (0, 0))
            )

        def pad1(x, D):
            return jnp.pad(x, ((0, 0), (0, D - x.shape[1])) + ((0, 0),) * (x.ndim - 2))

        return cls(
            maps_padded=jnp.concatenate([pad_map(t.maps_padded) for t in textures]),
            faces_uvs_padded=jnp.concatenate(
                [pad1(t.faces_uvs_padded, F) for t in textures]
            ),
            verts_uvs_padded=jnp.concatenate(
                [pad1(t.verts_uvs_padded, V) for t in textures]
            ),
            padding_mode=first.padding_mode,
            align_corners=first.align_corners,
            sampling_mode=first.sampling_mode,
        )


@struct.dataclass
class TexturesAtlas:
    """Per-face RxR texture atlas."""

    atlas_padded: jnp.ndarray  # (N, F, R, R, C)

    @classmethod
    def create(cls, atlas) -> "TexturesAtlas":
        if isinstance(atlas, (list, tuple)):
            atlas = list_to_padded([jnp.asarray(a, jnp.float32) for a in atlas])
        else:
            atlas = jnp.asarray(atlas, jnp.float32)
        if atlas.ndim != 5:
            raise ValueError("atlas must be (N, F, R, R, C)")
        return cls(atlas_padded=atlas)

    def atlas_packed(self) -> jnp.ndarray:
        N, F = self.atlas_padded.shape[:2]
        return self.atlas_padded.reshape((N * F,) + self.atlas_padded.shape[2:])

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
        return TexturesAtlas(atlas_padded=self.atlas_padded[index])

    def join_scene(self, face_order=None) -> "TexturesAtlas":
        """Merge the batch into one per-face atlas, following the packed-face
        compaction permutation of `join_meshes_as_scene` (reference
        textures.py TexturesAtlas.join_scene)."""
        atlas = self.atlas_packed()  # (N*F, R, R, C)
        if face_order is not None:
            atlas = atlas[face_order]
        return TexturesAtlas(atlas_padded=atlas[None])

    @classmethod
    def join_batch(cls, textures: List["TexturesAtlas"]) -> "TexturesAtlas":
        F = max(t.atlas_padded.shape[1] for t in textures)

        def pad(x):
            return jnp.pad(
                x, ((0, 0), (0, F - x.shape[1])) + ((0, 0),) * (x.ndim - 2)
            )

        return cls(
            atlas_padded=jnp.concatenate([pad(t.atlas_padded) for t in textures])
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
