"""Dataset collation utilities (reference datasets/utils.py:15)."""

from __future__ import annotations

from typing import Dict, List

from ..structures.meshes import Meshes, join_meshes_as_batch


def collate_batched_meshes(batch: List[Dict]) -> Dict:
    """Collate dataset dicts; list-of-mesh entries become a Meshes batch
    (reference :15)."""
    if batch is None or len(batch) == 0:
        return {}
    collated_dict = {}
    for k in batch[0].keys():
        collated_dict[k] = [d[k] for d in batch]
    if {"verts", "faces"}.issubset(collated_dict.keys()):
        collated_dict["mesh"] = join_meshes_as_batch(
            [
                Meshes.create([v], [f])
                for v, f in zip(collated_dict["verts"], collated_dict["faces"])
            ]
        )
    return collated_dict
