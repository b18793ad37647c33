"""Mesh-renderer utilities: barycentric fixes and rectangle packing.

Parity: reference renderer/mesh/utils.py (`_clip_barycentric_coordinates`
:15, `_interpolate_zbuf` :40, `Rectangle`/`PackedRectangle`/
`PackedRectangles` :73-86, `pack_rectangles` :210,
`pack_unique_rectangles` :268). The packing is host-side (used to lay
out UV maps for TexturesUV.join_scene).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp

from ...ops.interp_face_attrs import interpolate_face_attributes
from .rasterize_meshes import barycentric_coordinates_clip


def _clip_barycentric_coordinates(bary: jnp.ndarray) -> jnp.ndarray:
    """Clamp negatives and renormalize, array form (..., 3)
    (reference :15)."""
    clipped = jnp.clip(bary, 0.0)
    return clipped / jnp.clip(
        clipped.sum(axis=-1, keepdims=True), 1e-5
    )


def _interpolate_zbuf(pix_to_face, barycentric_coords, meshes) -> jnp.ndarray:
    """Re-interpolate the z buffer with (possibly clipped) barycentrics
    (reference :40)."""
    verts = meshes.verts_packed()
    faces = meshes.faces_packed()
    faces_verts_z = verts[jnp.maximum(faces, 0)][..., 2][..., None]
    zbuf = interpolate_face_attributes(
        pix_to_face, barycentric_coords, faces_verts_z
    )[..., 0]
    return jnp.where(pix_to_face >= 0, zbuf, -1.0)


class Rectangle(NamedTuple):
    xsize: int
    ysize: int
    identifier: int


class PackedRectangle(NamedTuple):
    x: int
    y: int
    flipped: bool
    is_first: bool


class PackedRectangles(NamedTuple):
    total_size: Tuple[int, int]
    locations: List[PackedRectangle]


class _UnplacedRectangle(NamedTuple):
    size: Tuple[int, int]
    ind: int
    flipped: bool


def _try_place_rectangle(rect, placed_so_far, occupied) -> bool:
    """Try to place rect within the current bounding box by scanning the
    rightmost-extent interval list; modifies placed_so_far/occupied in
    place (reference mesh/utils.py:99, ported exactly)."""
    total_width = occupied[0][0]
    needed_height = rect.size[1]
    current_start_idx = None
    current_max_width = 0
    previous_height = 0
    currently_packed = 0
    for idx, interval in enumerate(occupied):
        if interval[0] <= total_width - rect.size[0]:
            currently_packed += interval[1] - previous_height
            current_max_width = max(interval[0], current_max_width)
            if current_start_idx is None:
                current_start_idx = idx
            if currently_packed >= needed_height:
                current_max_width = max(interval[0], current_max_width)
                placed_so_far[rect.ind] = PackedRectangle(
                    current_max_width,
                    occupied[current_start_idx - 1][1],
                    rect.flipped,
                    True,
                )
                new_occupied = (
                    current_max_width + rect.size[0],
                    occupied[current_start_idx - 1][1] + needed_height,
                )
                if currently_packed == needed_height:
                    occupied[idx] = new_occupied
                    del occupied[current_start_idx:idx]
                elif idx > current_start_idx:
                    occupied[idx - 1] = new_occupied
                    del occupied[current_start_idx : (idx - 1)]
                else:
                    occupied.insert(idx, new_occupied)
                return True
        else:
            current_start_idx = None
            current_max_width = 0
            currently_packed = 0
        previous_height = interval[1]
    return False


def pack_rectangles(sizes: List[Tuple[int, int]]) -> PackedRectangles:
    """Naive rectangle packing with 90-degree flips allowed
    (reference :210); used to pack UV maps for join_scene."""
    if len(sizes) < 2:
        raise ValueError("Cannot pack less than two boxes")

    queue = []
    for i, size in enumerate(sizes):
        if size[0] < size[1]:
            queue.append(_UnplacedRectangle((size[1], size[0]), i, True))
        else:
            queue.append(_UnplacedRectangle((size[0], size[1]), i, False))
    queue.sort()
    placed_so_far = [PackedRectangle(-1, -1, False, False)] * len(sizes)

    biggest = queue.pop()
    total_width, current_height = biggest.size
    placed_so_far[biggest.ind] = PackedRectangle(0, 0, biggest.flipped, True)

    second = queue.pop()
    placed_so_far[second.ind] = PackedRectangle(
        0, current_height, second.flipped, True
    )
    current_height += second.size[1]
    occupied = [biggest.size, (second.size[0], current_height)]

    for rect in reversed(queue):
        if _try_place_rectangle(rect, placed_so_far, occupied):
            continue
        rotated = _UnplacedRectangle(
            (rect.size[1], rect.size[0]), rect.ind, not rect.flipped
        )
        if _try_place_rectangle(rotated, placed_so_far, occupied):
            continue
        placed_so_far[rect.ind] = PackedRectangle(
            0, current_height, rect.flipped, True
        )
        current_height += rect.size[1]
        occupied.append((rect.size[0], current_height))

    return PackedRectangles((total_width, current_height), placed_so_far)


def pack_unique_rectangles(rectangles: List[Rectangle]) -> PackedRectangles:
    """pack_rectangles over identifier-deduplicated inputs; duplicates
    share a location, only the first has is_first=True (reference :268)."""
    input_map = {}
    input_indices = []
    unique_sizes = []
    for rect in rectangles:
        if rect.identifier not in input_map:
            input_map[rect.identifier] = len(unique_sizes)
            input_indices.append((len(unique_sizes), True))
            unique_sizes.append((rect.xsize, rect.ysize))
        else:
            input_indices.append((input_map[rect.identifier], False))
    if len(unique_sizes) == 1:
        w, h = unique_sizes[0]
        locs = [
            PackedRectangle(0, 0, False, is_first)
            for _, is_first in input_indices
        ]
        return PackedRectangles((w, h), locs)
    packed = pack_rectangles(unique_sizes)
    locs = [
        PackedRectangle(
            packed.locations[ui].x,
            packed.locations[ui].y,
            packed.locations[ui].flipped,
            is_first,
        )
        for ui, is_first in input_indices
    ]
    return PackedRectangles(packed.total_size, locs)
