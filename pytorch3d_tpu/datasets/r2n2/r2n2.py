"""R2N2 dataset (ShapeNet subset + Blender renderings + binvox voxels).

Parity: reference datasets/r2n2/r2n2.py:47.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..shapenet.shapenet_core import ShapeNetBase
from .utils import compute_extrinsic_matrix, read_binvox_coords

MAX_CAMERA_DISTANCE = 1.75  # reference r2n2.py constant
BLENDER_INTRINSIC = jnp.asarray(
    [
        [2.1875, 0.0, 0.0, 0.0],
        [0.0, 2.1875, 0.0, 0.0],
        [0.0, 0.0, -1.002002, -0.2002002],
        [0.0, 0.0, -1.0, 0.0],
    ],
    jnp.float32,
)


class R2N2(ShapeNetBase):
    def __init__(
        self,
        split: str,
        shapenet_dir: str,
        r2n2_dir: str,
        splits_file: str,
        return_all_views: bool = True,
        return_voxels: bool = False,
        views_rel_path: str = "ShapeNetRendering",
        voxels_rel_path: str = "ShapeNetVoxels",
        load_textures: bool = True,
        texture_resolution: int = 4,
    ) -> None:
        super().__init__()
        self.shapenet_dir = shapenet_dir
        self.r2n2_dir = r2n2_dir
        self.views_rel_path = views_rel_path
        self.voxels_rel_path = voxels_rel_path
        self.return_all_views = return_all_views
        self.return_voxels = return_voxels
        self.load_textures = load_textures
        self.texture_resolution = texture_resolution
        if split not in ("train", "val", "test"):
            raise ValueError("split has to be one of (train, val, test).")
        with open(splits_file) as f:
            split_dict = json.load(f)[split]
        self.views_per_model_list: List[List[int]] = []
        for synset in split_dict:
            self.synset_start_idxs[synset] = len(self.synset_ids)
            for model in split_dict[synset]:
                model_path = os.path.join(
                    shapenet_dir, synset, model, self.model_dir
                )
                if not os.path.isfile(model_path):
                    continue
                self.synset_ids.append(synset)
                self.model_ids.append(model)
            self.synset_num_models[synset] = (
                len(self.synset_ids) - self.synset_start_idxs[synset]
            )

    def __getitem__(self, model_idx, view_idxs: Optional[List[int]] = None) -> Dict:
        if isinstance(model_idx, tuple):
            model_idx, view_idxs = model_idx
        model = self._get_item_ids(model_idx)
        model_path = os.path.join(
            self.shapenet_dir, model["synset_id"], model["model_id"],
            self.model_dir,
        )
        verts, faces, textures = self._load_mesh(model_path)
        model["verts"] = verts
        model["faces"] = faces
        model["textures"] = textures

        # renderings + metadata
        rendering_path = os.path.join(
            self.r2n2_dir, self.views_rel_path, model["synset_id"],
            model["model_id"], "rendering",
        )
        images, Rs, Ts = [], [], []
        if os.path.isdir(rendering_path):
            from PIL import Image

            meta = np.loadtxt(
                os.path.join(rendering_path, "rendering_metadata.txt")
            ).reshape(-1, 5)
            n_views = meta.shape[0]
            idxs = (
                list(range(n_views))
                if (view_idxs is None and self.return_all_views)
                else (view_idxs or [0])
            )
            for i in idxs:
                img = Image.open(
                    os.path.join(rendering_path, "%02d.png" % i)
                ).convert("RGB")
                images.append(np.asarray(img, np.float32) / 255.0)
                azim, elev, yaw, dist_ratio, fov = meta[i]
                dist = dist_ratio * MAX_CAMERA_DISTANCE
                RT = np.asarray(
                    compute_extrinsic_matrix(azim, elev, dist)
                )
                Rs.append(RT[:3, :3].T)
                Ts.append(RT[:3, 3])
        if images:
            model["images"] = jnp.asarray(np.stack(images))
            model["R"] = jnp.asarray(np.stack(Rs))
            model["T"] = jnp.asarray(np.stack(Ts))
            model["K"] = jnp.broadcast_to(
                BLENDER_INTRINSIC, (len(images), 4, 4)
            )

        if self.return_voxels:
            voxel_path = os.path.join(
                self.r2n2_dir, self.voxels_rel_path, model["synset_id"],
                model["model_id"], "model.binvox",
            )
            if os.path.isfile(voxel_path):
                with open(voxel_path, "rb") as f:
                    model["voxel_coords"] = read_binvox_coords(f)
            else:
                warnings.warn(f"Voxel file not found for model {model['model_id']}")
        return model
