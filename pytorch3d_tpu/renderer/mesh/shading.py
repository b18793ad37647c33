"""Shading math (parity: reference renderer/mesh/shading.py)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...ops.interp_face_attrs import interpolate_face_attributes


def _apply_lighting(
    points, normals, lights, cameras, materials
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel (or per-vertex) ambient/diffuse/specular colors."""
    light_diffuse = lights.diffuse(normals=normals, points=points)
    light_specular = lights.specular(
        normals=normals,
        points=points,
        camera_position=cameras.get_camera_center(),
        shininess=materials.shininess,
    )
    ambient_color = materials.ambient_color * lights.ambient_color
    diffuse_color = materials.diffuse_color * light_diffuse
    specular_color = materials.specular_color * light_specular

    if normals.ndim == 2 and points.ndim == 2:
        # per-vertex packed case
        return ambient_color, diffuse_color, specular_color
    if ambient_color.ndim != points.ndim:
        # (N, 3) -> (N, 1, 1, 1, 3) for image-shaped tensors
        while ambient_color.ndim < points.ndim:
            ambient_color = ambient_color[:, None]
    return ambient_color, diffuse_color, specular_color


def phong_shading(meshes, fragments, lights, cameras, materials, texels) -> jnp.ndarray:
    """Per-pixel Phong: interpolate positions+normals, then light (ref :100)."""
    verts = meshes.verts_packed()
    faces = meshes.faces_packed()
    vertex_normals = meshes.verts_normals_packed()
    faces_verts = verts[faces]
    faces_normals = vertex_normals[faces]
    pixel_coords = interpolate_face_attributes(
        fragments.pix_to_face, fragments.bary_coords, faces_verts
    )
    pixel_normals = interpolate_face_attributes(
        fragments.pix_to_face, fragments.bary_coords, faces_normals
    )
    ambient, diffuse, specular = _apply_lighting(
        pixel_coords, pixel_normals, lights, cameras, materials
    )
    return (ambient + diffuse) * texels + specular


def gouraud_shading(meshes, fragments, lights, cameras, materials) -> jnp.ndarray:
    """Per-vertex lighting then barycentric color interpolation (ref :127).

    Requires TexturesVertex on the meshes.
    """
    from .textures import TexturesVertex

    if not isinstance(meshes.textures, TexturesVertex):
        raise ValueError("Mesh textures must be an instance of TexturesVertex")
    faces = meshes.faces_packed()
    verts = meshes.verts_packed()
    verts_normals = meshes.verts_normals_packed()
    verts_colors = meshes.textures.verts_features_packed()
    vert_to_mesh_idx = meshes.verts_packed_to_mesh_idx()

    # Broadcast per-mesh light/camera/material params to per-vertex —
    # the reference's gather_props(vert_to_mesh_idx) (shading.py:163).
    n_meshes = len(meshes)

    def gather(props):
        if props is None or n_meshes == 1:
            return props
        return jax.tree_util.tree_map(
            lambda x: x[vert_to_mesh_idx]
            if hasattr(x, "ndim") and x.ndim > 0 and x.shape[0] == n_meshes
            else x,
            props,
        )

    ambient, diffuse, specular = _apply_lighting(
        verts, verts_normals, gather(lights), gather(cameras),
        gather(materials),
    )
    verts_colors_shaded = verts_colors * (ambient + diffuse) + specular
    face_colors = verts_colors_shaded[faces]
    return interpolate_face_attributes(
        fragments.pix_to_face, fragments.bary_coords, face_colors
    )


def flat_shading(meshes, fragments, lights, cameras, materials, texels) -> jnp.ndarray:
    """One normal and color per face (reference :181)."""
    face_normals = meshes.faces_normals_packed()
    faces = meshes.faces_packed()
    verts = meshes.verts_packed()
    face_coords = verts[faces].mean(axis=-2)  # (F, 3)

    sel = jnp.maximum(fragments.pix_to_face, 0)
    pixel_coords = face_coords[sel]
    pixel_normals = face_normals[sel]
    mask = (fragments.pix_to_face >= 0)[..., None]
    pixel_coords = jnp.where(mask, pixel_coords, 0.0)
    pixel_normals = jnp.where(mask, pixel_normals, 0.0)

    ambient, diffuse, specular = _apply_lighting(
        pixel_coords, pixel_normals, lights, cameras, materials
    )
    return (ambient + diffuse) * texels + specular

