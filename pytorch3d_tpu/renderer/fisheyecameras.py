"""Fisheye camera with radial / tangential / thin-prism distortion.

Parity: reference renderer/fisheyecameras.py:23 (`FishEyeCameras`,
equidistant model with polynomial distortion, following the OpenCV /
Project Aria convention): for view point (x, y, z) with r = |(x, y)|,
theta = atan2(r, z),

    th_d = theta (1 + k0 th^2 + ... + k5 th^12)          # radial
    [u, v] = th_d (x, y)/r
    [u, v] += tangential + thin-prism terms (if enabled)
    projected = f * [u, v] + principal_point

Unprojection solves the scalar polynomial by Newton iteration (a fixed
8-step `fori`, XLA-friendly vs the reference's while loop).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .cameras import CamerasBase, get_world_to_view_transform


@struct.dataclass
class FishEyeCameras(CamerasBase):
    R: jnp.ndarray  # (N, 3, 3)
    T: jnp.ndarray  # (N, 3)
    focal_length: jnp.ndarray  # (N, 1)
    principal_point: jnp.ndarray  # (N, 2)
    radial_params: jnp.ndarray  # (N, 6)
    tangential_params: jnp.ndarray  # (N, 2)
    thin_prism_params: jnp.ndarray  # (N, 4)
    use_radial: bool = struct.field(pytree_node=False, default=True)
    use_tangential: bool = struct.field(pytree_node=False, default=True)
    use_thin_prism: bool = struct.field(pytree_node=False, default=True)
    world_coordinates: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        focal_length=1.0,
        principal_point=((0.0, 0.0),),
        radial_params=((0.0,) * 6,),
        tangential_params=((0.0, 0.0),),
        thin_prism_params=((0.0,) * 4,),
        R: Optional[jnp.ndarray] = None,
        T: Optional[jnp.ndarray] = None,
        world_coordinates: bool = False,
        use_radial: bool = True,
        use_tangential: bool = True,
        use_thin_prism: bool = True,
    ) -> "FishEyeCameras":
        R = jnp.asarray(R, jnp.float32) if R is not None else jnp.eye(3)[None]
        if R.ndim == 2:
            R = R[None]
        T = jnp.asarray(T, jnp.float32) if T is not None else jnp.zeros((1, 3))
        if T.ndim == 1:
            T = T[None]
        N = max(R.shape[0], jnp.asarray(focal_length).reshape(-1).shape[0])

        def batch(x, d):
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 0:
                x = x.reshape(1, 1)
            if x.ndim == 1:
                x = x[None] if x.shape[0] == d else x[:, None]
            return jnp.broadcast_to(x, (N, d))

        return cls(
            R=jnp.broadcast_to(R, (N, 3, 3)),
            T=jnp.broadcast_to(T, (N, 3)),
            focal_length=batch(focal_length, 1),
            principal_point=batch(principal_point, 2),
            radial_params=batch(radial_params, 6),
            tangential_params=batch(tangential_params, 2),
            thin_prism_params=batch(thin_prism_params, 4),
            use_radial=use_radial,
            use_tangential=use_tangential,
            use_thin_prism=use_thin_prism,
            world_coordinates=world_coordinates,
        )

    # ------------------------------------------------------------------ #
    def _distort(self, xr_yr: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
        """Tangential + thin-prism additive terms given xr_yr (..., 2)."""
        x, y = xr_yr[..., 0], xr_yr[..., 1]
        r2 = x * x + y * y
        delta = jnp.zeros_like(xr_yr)
        if self.use_tangential:
            p0 = self.tangential_params[..., None, 0]
            p1 = self.tangential_params[..., None, 1]
            delta = delta + jnp.stack(
                [
                    (r2 + 2.0 * x * x) * p0 + 2.0 * x * y * p1,
                    (r2 + 2.0 * y * y) * p1 + 2.0 * x * y * p0,
                ],
                axis=-1,
            )
        if self.use_thin_prism:
            s = self.thin_prism_params[:, None, :]
            r4 = r2 * r2
            delta = delta + jnp.stack(
                [
                    s[..., 0] * r2 + s[..., 1] * r4,
                    s[..., 2] * r2 + s[..., 3] * r4,
                ],
                axis=-1,
            )
        return delta

    def transform_points(self, points, eps: Optional[float] = None, **kwargs) -> jnp.ndarray:
        """Project world/view points to image coords (reference :147).

        Follows the reference `_project_points_batch` exactly: the base
        coordinates are perspective `ab = xy/z` (so `use_radial=False`
        degrades to a pinhole model, and negative-z points project
        symmetrically, reference :158), the tangential/thin-prism terms
        are always evaluated on the radial `xr_yr` coordinates, and the
        returned z component is 1 (reference :229)."""
        if points.ndim == 2:
            points = points[None]
        if self.world_coordinates or kwargs.get("from_world", False):
            w2v = get_world_to_view_transform(self.R, self.T)
            points = w2v.transform_points(points)
        eps = eps or 1e-9
        z = points[..., 2:]
        zsafe = jnp.where(jnp.abs(z) > eps, z, eps)
        ab = points[..., :2] / zsafe
        r = jnp.sqrt(jnp.sum(ab * ab, axis=-1))
        theta = jnp.arctan(r)

        th2 = theta * theta
        th_pow = jnp.stack(
            [th2 ** (i + 1) for i in range(6)], axis=-1
        )  # theta^2..theta^12
        k = self.radial_params[:, None, :]
        th_radial = 1.0 + jnp.sum(k * th_pow, axis=-1)
        # th/r with the r->0 limit of 1
        th_divr = jnp.where(r > eps, theta / jnp.clip(r, eps), 1.0)
        xr_yr = (th_radial * th_divr)[..., None] * ab

        uv = xr_yr if self.use_radial else ab
        uv = uv + self._distort(xr_yr, uv)
        f = self.focal_length[:, None, :]
        c = self.principal_point[:, None, :]
        xy = f * uv + c
        return jnp.concatenate([xy, jnp.ones_like(z)], axis=-1)

    def unproject_points(
        self, xy_depth: jnp.ndarray, world_coordinates: bool = True, **kwargs
    ) -> jnp.ndarray:
        """Invert the projection by Newton iterations (reference :303)."""
        if xy_depth.ndim == 2:
            xy_depth = xy_depth[None]
        f = self.focal_length[:, None, :]
        c = self.principal_point[:, None, :]
        uv = (xy_depth[..., :2] - c) / f

        # undo tangential/thin-prism by fixed-point iteration
        xr_yr = uv
        for _ in range(4 if (self.use_tangential or self.use_thin_prism) else 0):
            xr_yr = uv - self._distort(xr_yr, xr_yr)

        th_d = jnp.linalg.norm(xr_yr, axis=-1)

        # invert th_d = theta (1 + sum k_i theta^{2i+2}) by Newton
        theta = th_d
        if self.use_radial:
            k = self.radial_params[:, None, :]

            def newton(i, th):
                th2 = th * th
                poly = 1.0
                dpoly = 0.0
                p = th2
                for j in range(6):
                    poly = poly + k[..., j] * p
                    dpoly = dpoly + (2 * j + 2) * k[..., j] * p / jnp.clip(th, 1e-9)
                    p = p * th2
                fval = th * poly - th_d
                fprime = poly + th * dpoly
                return th - fval / jnp.clip(fprime, 1e-9)

            theta = jax.lax.fori_loop(0, 8, newton, theta)

        # direction: tan(theta) in xy over unit z
        r_dir = jnp.tan(theta)
        unit = xr_yr / jnp.clip(th_d, 1e-9)[..., None]
        xy_dir = unit * r_dir[..., None]
        depth = xy_depth[..., 2:]
        points_view = jnp.concatenate([xy_dir * depth, depth], axis=-1)
        if world_coordinates or self.world_coordinates:
            w2v = get_world_to_view_transform(self.R, self.T)
            return w2v.inverse().transform_points(points_view)
        return points_view

    def in_ndc(self) -> bool:
        return False

    def is_perspective(self) -> bool:
        return False
