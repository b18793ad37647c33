"""ShapeNetCore dataset.

Parity: reference datasets/shapenet/shapenet_core.py:22 +
shapenet_base.py:28 (`ShapeNetBase.render`).
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Dict, List, Optional

import jax.numpy as jnp

from ...io.obj_io import load_obj

SYNSET_DICT_DIR = os.path.join(os.path.dirname(__file__))


class ShapeNetBase:
    """Common machinery of ShapeNet-style datasets (reference
    shapenet_base.py:28)."""

    def __init__(self) -> None:
        self.synset_ids: List[str] = []
        self.model_ids: List[str] = []
        self.synset_inv: Dict[str, str] = {}
        self.synset_start_idxs: Dict[str, int] = {}
        self.synset_num_models: Dict[str, int] = {}
        self.shapenet_dir = ""
        self.model_dir = "model.obj"
        self.load_textures = True
        self.texture_resolution = 4

    def __len__(self) -> int:
        return len(self.model_ids)

    def _get_item_ids(self, idx) -> Dict:
        return {
            "synset_id": self.synset_ids[idx],
            "model_id": self.model_ids[idx],
        }

    def _load_mesh(self, model_path):
        verts, faces, aux = load_obj(
            model_path,
            create_texture_atlas=self.load_textures,
            load_textures=self.load_textures,
            texture_atlas_size=self.texture_resolution,
        )
        textures = aux.texture_atlas if self.load_textures else None
        return verts, faces.verts_idx, textures

    def render(
        self,
        model_ids: Optional[List[str]] = None,
        categories: Optional[List[str]] = None,
        sample_nums: Optional[List[int]] = None,
        idxs: Optional[List[int]] = None,
        cameras=None,
        raster_settings=None,
        lights=None,
        **kwargs,
    ):
        """Render selected models (reference shapenet_base.py:96)."""
        from ...renderer import (
            FoVPerspectiveCameras,
            HardPhongShader,
            MeshRasterizer,
            MeshRenderer,
            PointLights,
            RasterizationSettings,
            look_at_view_transform,
        )
        from ...renderer.mesh.textures import TexturesAtlas
        from ...structures.meshes import Meshes, join_meshes_as_batch

        idxs = self._handle_render_inputs(model_ids, categories, sample_nums, idxs)
        meshes = []
        for i in idxs:
            data = self[i]
            if data.get("textures") is not None:
                tex = TexturesAtlas.create(data["textures"][None])
            else:
                # untextured models render white (reference behavior)
                from ...renderer.mesh.textures import TexturesVertex

                tex = TexturesVertex.create(
                    jnp.ones_like(data["verts"])[None]
                )
            meshes.append(
                Meshes.create([data["verts"]], [data["faces"]], textures=tex)
            )
        mesh_batch = join_meshes_as_batch(meshes)
        if cameras is None:
            R, T = look_at_view_transform(
                dist=kwargs.pop("dist", 1.0),
                elev=kwargs.pop("elev", 0.0),
                azim=kwargs.pop("azim", 0.0),
            )
            cameras = FoVPerspectiveCameras.create(R=R, T=T)
        renderer = MeshRenderer(
            MeshRasterizer(
                cameras,
                raster_settings
                or RasterizationSettings(
                    image_size=kwargs.pop("image_size", 137)
                ),
            ),
            HardPhongShader(
                cameras=cameras,
                lights=lights or PointLights.create(location=[[0, 1, -2]]),
            ),
        )
        return renderer(mesh_batch, cameras=cameras, **kwargs)

    def _handle_render_inputs(self, model_ids, categories, sample_nums, idxs):
        if idxs is not None:
            return idxs
        if model_ids is not None:
            return [self.model_ids.index(m) for m in model_ids]
        import random

        sample_nums = sample_nums or [1]
        if categories is not None:
            out = []
            for cat, n in zip(categories, sample_nums):
                synset = self.synset_inv.get(cat, cat)
                start = self.synset_start_idxs[synset]
                count = self.synset_num_models[synset]
                out.extend(random.sample(range(start, start + count), n))
            return out
        return random.sample(range(len(self)), sample_nums[0])


class ShapeNetCore(ShapeNetBase):
    """Load ShapeNetCore v1/v2 from a local directory (reference :22)."""

    def __init__(
        self,
        data_dir: str,
        synsets: Optional[List[str]] = None,
        version: int = 1,
        load_textures: bool = True,
        texture_resolution: int = 4,
    ) -> None:
        super().__init__()
        self.shapenet_dir = data_dir
        self.load_textures = load_textures
        self.texture_resolution = texture_resolution
        if version not in (1, 2):
            raise ValueError("Version number must be either 1 or 2.")
        self.model_dir = (
            "model.obj" if version == 1 else "models/model_normalized.obj"
        )

        dict_file = os.path.join(
            SYNSET_DICT_DIR, f"shapenet_synset_dict_v{version}.json"
        )
        if os.path.isfile(dict_file):
            with open(dict_file) as f:
                self.synset_dict = json.load(f)
        else:
            # fall back: treat directory names as both id and label
            self.synset_dict = {
                d: d
                for d in os.listdir(data_dir)
                if os.path.isdir(os.path.join(data_dir, d))
            }
        self.synset_inv = {v: k for k, v in self.synset_dict.items()}

        if synsets is not None:
            synset_set = {
                self.synset_inv.get(s, s)
                for s in synsets
            }
        else:
            synset_set = {
                d
                for d in os.listdir(data_dir)
                if os.path.isdir(os.path.join(data_dir, d))
            }

        for synset in sorted(synset_set):
            self.synset_start_idxs[synset] = len(self.synset_ids)
            syn_dir = os.path.join(data_dir, synset)
            if not os.path.isdir(syn_dir):
                warnings.warn(f"Synset category {synset} not found in {data_dir}.")
                continue
            for model in sorted(os.listdir(syn_dir)):
                if not os.path.isfile(
                    os.path.join(syn_dir, model, self.model_dir)
                ):
                    continue
                self.synset_ids.append(synset)
                self.model_ids.append(model)
            self.synset_num_models[synset] = (
                len(self.synset_ids) - self.synset_start_idxs[synset]
            )

    def __getitem__(self, idx: int) -> Dict:
        model = self._get_item_ids(idx)
        model_path = os.path.join(
            self.shapenet_dir, model["synset_id"], model["model_id"],
            self.model_dir,
        )
        verts, faces, textures = self._load_mesh(model_path)
        model["verts"] = verts
        model["faces"] = faces
        model["textures"] = textures
        model["label"] = self.synset_dict.get(
            model["synset_id"], model["synset_id"]
        )
        return model
