"""Dataset visualization helpers.

Parity: reference implicitron/dataset/visualize.py:19
(`get_implicitron_sequence_pointcloud`): unproject the depth maps of a
sequence's frames into one colored point cloud.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..tools.point_cloud_utils import get_rgbd_point_cloud
from .frame_data import FrameData


def get_implicitron_sequence_pointcloud(
    dataset,
    sequence_name: Optional[str] = None,
    mask_points: bool = True,
    max_frames: int = -1,
    num_workers: int = 0,
    load_dataset_point_cloud: bool = False,
) -> Tuple["object", FrameData]:
    """Point cloud sampled from the (masked) RGBD frames of a sequence
    (reference visualize.py:19). Returns (Pointclouds, collated
    FrameData)."""
    if len(dataset) == 0:
        raise ValueError("The dataset is empty.")
    if not getattr(dataset, "load_depths", True):
        raise ValueError(
            "The dataset has to load depths (dataset.load_depths=True)."
        )
    if mask_points and not getattr(dataset, "load_masks", True):
        raise ValueError(
            "For mask_points=True, the dataset has to load masks"
            " (dataset.load_masks=True)."
        )

    entries = list(range(len(dataset)))
    if sequence_name is not None:
        entries = list(dataset.sequence_indices_in_order(sequence_name))
        if len(entries) == 0:
            raise ValueError(
                f'There are no dataset entries for sequence name "{sequence_name}".'
            )
    if max_frames > 0 and len(entries) > max_frames:
        rng = np.random.RandomState(0)
        entries = sorted(
            rng.permutation(len(entries))[:max_frames].tolist()
        )
        entries = [entries[i] for i in range(len(entries))]

    frames = [dataset[i] for i in entries]
    frame_data = FrameData.collate(frames)

    if load_dataset_point_cloud:
        point_cloud = frame_data.sequence_point_cloud
        if point_cloud is None:
            raise ValueError(
                "For load_dataset_point_cloud=True, the dataset has to "
                "load point clouds."
            )
    else:
        fg = frame_data.fg_probability
        point_cloud = get_rgbd_point_cloud(
            frame_data.camera,
            frame_data.image_rgb,
            frame_data.depth_map,
            (fg > 0.5).astype(np.float32)
            if mask_points and fg is not None
            else None,
        )
    return point_cloud, frame_data
