"""Lights (parity: reference renderer/lighting.py).

Default colors match the reference: ambient 0.5, diffuse 0.3, specular 0.2.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


def _normalize(v: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps * eps))


def _expand_to(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Insert singleton spatial dims: (N, C) -> (N, 1, ..., 1, C).

    1D inputs (C,) first gain a leading batch dim."""
    if x.ndim == 1:
        x = x[None]
    while x.ndim < target_ndim:
        x = x[:, None]
    return x


def diffuse(normals: jnp.ndarray, color: jnp.ndarray, direction: jnp.ndarray):
    """Lambertian diffuse term (reference lighting.py:17)."""
    if direction.shape != normals.shape:
        direction = _expand_to(direction, normals.ndim)
    if color.shape != normals.shape:
        color = _expand_to(color, normals.ndim)
    normals = _normalize(normals)
    direction = _normalize(direction)
    angle = jnp.maximum(jnp.sum(normals * direction, axis=-1), 0.0)
    return color * angle[..., None]


def specular(
    points, normals, direction, color, camera_position, shininess
) -> jnp.ndarray:
    """Phong specular term (reference lighting.py:78)."""
    if points.shape != normals.shape:
        raise ValueError("Expected points and normals to have the same shape.")
    if direction.shape != normals.shape:
        direction = _expand_to(direction, normals.ndim)
    if color.shape != normals.shape:
        color = _expand_to(color, normals.ndim)
    if isinstance(camera_position, jnp.ndarray) and camera_position.shape != normals.shape:
        camera_position = _expand_to(camera_position, normals.ndim)
    shininess = jnp.asarray(shininess)
    if shininess.ndim > 0 and shininess.shape != normals.shape[:-1]:
        shininess = _expand_to(shininess[..., None], normals.ndim)[..., 0]

    normals = _normalize(normals)
    direction = _normalize(direction)
    cos_angle = jnp.sum(normals * direction, axis=-1)
    mask = (cos_angle > 0).astype(points.dtype)
    view_direction = _normalize(camera_position - points)
    reflect_direction = -direction + 2.0 * cos_angle[..., None] * normals
    alpha = (
        jnp.maximum(jnp.sum(view_direction * reflect_direction, axis=-1), 0.0) * mask
    )
    return color * jnp.power(alpha, shininess)[..., None]


def _color_batch(c) -> jnp.ndarray:
    c = jnp.asarray(c, jnp.float32)
    if c.ndim == 1:
        c = c[None]
    return c


@struct.dataclass
class DirectionalLights:
    """Light at infinity with a fixed direction (reference lighting.py:161)."""

    ambient_color: jnp.ndarray = None
    diffuse_color: jnp.ndarray = None
    specular_color: jnp.ndarray = None
    direction: jnp.ndarray = None

    @classmethod
    def create(
        cls,
        ambient_color=((0.5, 0.5, 0.5),),
        diffuse_color=((0.3, 0.3, 0.3),),
        specular_color=((0.2, 0.2, 0.2),),
        direction=((0, 1, 0),),
    ) -> "DirectionalLights":
        return cls(
            ambient_color=_color_batch(ambient_color),
            diffuse_color=_color_batch(diffuse_color),
            specular_color=_color_batch(specular_color),
            direction=_color_batch(direction),
        )

    def diffuse(self, normals, points=None) -> jnp.ndarray:
        return diffuse(
            normals=normals, color=self.diffuse_color, direction=self.direction
        )

    def specular(self, normals, points, camera_position, shininess) -> jnp.ndarray:
        return specular(
            points=points,
            normals=normals,
            color=self.specular_color,
            direction=self.direction,
            camera_position=camera_position,
            shininess=shininess,
        )

    def clone(self):
        return self


@struct.dataclass
class PointLights:
    """Point light with a 3D location (reference lighting.py:224)."""

    ambient_color: jnp.ndarray = None
    diffuse_color: jnp.ndarray = None
    specular_color: jnp.ndarray = None
    location: jnp.ndarray = None

    @classmethod
    def create(
        cls,
        ambient_color=((0.5, 0.5, 0.5),),
        diffuse_color=((0.3, 0.3, 0.3),),
        specular_color=((0.2, 0.2, 0.2),),
        location=((0, 1, 0),),
    ) -> "PointLights":
        return cls(
            ambient_color=_color_batch(ambient_color),
            diffuse_color=_color_batch(diffuse_color),
            specular_color=_color_batch(specular_color),
            location=_color_batch(location),
        )

    def reshape_location(self, points) -> jnp.ndarray:
        if self.location.ndim == points.ndim:
            return self.location
        return _expand_to(self.location, points.ndim)

    def diffuse(self, normals, points) -> jnp.ndarray:
        location = self.reshape_location(points)
        direction = location - points
        return diffuse(normals=normals, color=self.diffuse_color, direction=direction)

    def specular(self, normals, points, camera_position, shininess) -> jnp.ndarray:
        location = self.reshape_location(points)
        direction = location - points
        return specular(
            points=points,
            normals=normals,
            color=self.specular_color,
            direction=direction,
            camera_position=camera_position,
            shininess=shininess,
        )

    def clone(self):
        return self


@struct.dataclass
class AmbientLights:
    """Uniform ambient-only lighting (reference lighting.py:296)."""

    ambient_color: jnp.ndarray = None

    @classmethod
    def create(cls, ambient_color=((1.0, 1.0, 1.0),)) -> "AmbientLights":
        return cls(ambient_color=_color_batch(ambient_color))

    def diffuse(self, normals, points) -> jnp.ndarray:
        return jnp.zeros_like(points)

    def specular(self, normals, points, camera_position, shininess) -> jnp.ndarray:
        return jnp.zeros_like(points)

    def clone(self):
        return self
