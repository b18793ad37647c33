"""Synthetic dataset: renders a textured mesh from a ring of viewpoints.

Parity: reference
implicitron/dataset/rendered_mesh_dataset_map_provider.py:35
(`RenderedMeshDatasetMapProvider` — renders the cow mesh in-process for
tests/demos).  We render an ico-sphere with vertex colors through our own
mesh renderer (dogfooding the pipeline), or the cow obj if a path is given.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...renderer import (
    FoVPerspectiveCameras,
    HardPhongShader,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    look_at_view_transform,
)
from ...renderer.mesh.textures import TexturesVertex
from ...utils.ico_sphere import ico_sphere
from ..tools.config import Configurable
from .frame_data import FrameData


@dataclasses.dataclass
class RenderedMeshDatasetMapProvider(Configurable):
    num_views: int = 40
    data_file: Optional[str] = None  # path to an .obj; None -> ico sphere
    azimuth_range: float = 180.0
    distance: float = 2.7
    resolution: int = 128
    use_point_light: bool = True

    def __post_init__(self):
        self._dataset = None

    def _build(self) -> List[FrameData]:
        if self.data_file is not None:
            from ...io import load_objs_as_meshes

            mesh = load_objs_as_meshes([self.data_file])
        else:
            mesh = ico_sphere(3)
            colors = mesh.verts_padded() * 0.5 + 0.5
            mesh = mesh.replace(textures=TexturesVertex.create(colors))

        azims = np.linspace(
            -self.azimuth_range, self.azimuth_range, self.num_views
        ).astype(np.float32)
        R, T = look_at_view_transform(
            dist=self.distance, elev=20.0, azim=jnp.asarray(azims)
        )
        cameras = FoVPerspectiveCameras.create(R=R, T=T)
        lights = (
            PointLights.create(location=[[0.0, 0.0, -3.0]])
            if self.use_point_light
            else None
        )
        renderer = MeshRenderer(
            MeshRasterizer(
                cameras,
                RasterizationSettings(
                    image_size=self.resolution, faces_per_pixel=1
                ),
            ),
            HardPhongShader(cameras=cameras, lights=lights),
        )
        frames = []
        batch = mesh.extend(self.num_views)
        images = renderer(batch, cameras=cameras)  # (V, H, W, 4)
        for i in range(self.num_views):
            cam_i = FoVPerspectiveCameras.create(
                R=R[i : i + 1], T=T[i : i + 1]
            )
            frames.append(
                FrameData(
                    frame_number=i,
                    sequence_name="sphere_seq",
                    sequence_category="sphere",
                    image_rgb=images[i : i + 1, ..., :3],
                    fg_probability=(
                        images[i : i + 1, ..., 3:4] > 0.5
                    ).astype(jnp.float32),
                    camera=cam_i,
                    frame_type="known",
                )
            )
        return frames

    def get_dataset_map(self):
        """{'train': [...], 'val': [...], 'test': [...]} FrameData lists."""
        if self._dataset is None:
            self._dataset = self._build()
        n = len(self._dataset)
        n_test = max(n // 10, 1)
        return {
            "train": self._dataset[: n - n_test],
            "val": self._dataset[n - n_test :],
            "test": self._dataset[n - n_test :],
        }
