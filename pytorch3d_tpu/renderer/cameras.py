"""Batched cameras (parity: reference renderer/cameras.py).

Coordinate conventions (identical to the reference, cameras.py:39-59):

- World / view / NDC spaces are right-handed with +X left, +Y up, +Z away
  from the user (into the screen).
- Screen space is +X right, +Y down, origin at the top-left pixel corner.
- NDC: for square images x, y in [-1, 1]; for non-square, the short side is
  [-1, 1] and the long side scales by aspect.
- Points are row vectors: ``x_out = x @ M`` via `Transform3d`.

Camera families:
- `FoVPerspectiveCameras` / `FoVOrthographicCameras` — OpenGL-style frustum
  parameters, always NDC.
- `PerspectiveCameras` / `OrthographicCameras` — SfM-style focal/principal
  point, in NDC or screen space.

All classes are immutable flax pytrees; parameter overrides flow through
method ``**kwargs`` exactly like the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct

from ..transforms import Rotate, Transform3d, Translate

# --------------------------------------------------------------------------- #
# Helpers
# --------------------------------------------------------------------------- #


def _to_batch(x, last_dim: Optional[int] = None, dtype=jnp.float32) -> jnp.ndarray:
    """Convert a scalar / tuple / array to a batched array (N, ...)."""
    x = jnp.asarray(x, dtype=dtype)
    if last_dim is None:
        if x.ndim == 0:
            x = x[None]
        return x
    if x.ndim == 0:
        x = x[None, None]
    elif x.ndim == 1:
        # 1-D means a batch of N scalars (reference convention: focal_length
        # of shape (N,) is N cameras), not a single (fx, fy) pair.
        x = x[:, None]
    return x


def _broadcast_batch(*arrays):
    """Broadcast leading batch dims of a set of arrays to a common N."""
    N = max(a.shape[0] for a in arrays)
    out = []
    for a in arrays:
        if a.shape[0] == N:
            out.append(a)
        elif a.shape[0] == 1:
            out.append(jnp.broadcast_to(a, (N,) + a.shape[1:]))
        else:
            raise ValueError("Incompatible batch sizes in camera args.")
    return out


def get_world_to_view_transform(R: jnp.ndarray, T: jnp.ndarray) -> Transform3d:
    """World -> view: X_view = X_world @ R + T (reference cameras.py:1564)."""
    if T.ndim != 2 or T.shape[1] != 3:
        raise ValueError(f"Expected T to have shape (N, 3); got {T.shape}")
    if R.ndim != 3 or R.shape[1:] != (3, 3):
        raise ValueError(f"Expected R to have shape (N, 3, 3); got {R.shape}")
    return Rotate(R).compose(Translate(T))


# --------------------------------------------------------------------------- #
# Base camera behaviour (mixin over flax struct dataclasses)
# --------------------------------------------------------------------------- #


class CamerasBase:
    """Shared camera behaviour. Subclasses are immutable pytrees with fields
    R (N, 3, 3), T (N, 3) and family-specific intrinsics."""

    def __len__(self) -> int:
        return self.R.shape[0]

    @property
    def dtype(self):
        return self.R.dtype

    # -- extrinsics -------------------------------------------------------- #
    def get_world_to_view_transform(self, **kwargs) -> Transform3d:
        R = kwargs.get("R", self.R)
        T = kwargs.get("T", self.T)
        return get_world_to_view_transform(R=R, T=T)

    def get_camera_center(self, **kwargs) -> jnp.ndarray:
        w2v = self.get_world_to_view_transform(**kwargs)
        return w2v.inverse().get_matrix()[:, 3, :3]

    # -- projection (abstract) --------------------------------------------- #
    def get_projection_transform(self, **kwargs) -> Transform3d:
        raise NotImplementedError

    def unproject_points(self, xy_depth: jnp.ndarray, **kwargs) -> jnp.ndarray:
        raise NotImplementedError

    def is_perspective(self) -> bool:
        raise NotImplementedError

    def in_ndc(self) -> bool:
        raise NotImplementedError

    # -- composition -------------------------------------------------------- #
    def get_full_projection_transform(self, **kwargs) -> Transform3d:
        w2v = self.get_world_to_view_transform(**kwargs)
        proj = self.get_projection_transform(**kwargs)
        return w2v.compose(proj)

    def get_ndc_camera_transform(self, **kwargs) -> Transform3d:
        """Projection space -> NDC space; identity for NDC-defined cameras."""
        return Transform3d.create()

    def transform_points(
        self, points: jnp.ndarray, eps: Optional[float] = None, **kwargs
    ) -> jnp.ndarray:
        return self.get_full_projection_transform(**kwargs).transform_points(
            points, eps=eps
        )

    def transform_points_ndc(
        self, points: jnp.ndarray, eps: Optional[float] = None, **kwargs
    ) -> jnp.ndarray:
        world_to_ndc = self.get_full_projection_transform(**kwargs)
        if not self.in_ndc():
            to_ndc = self.get_ndc_camera_transform(**kwargs)
            world_to_ndc = world_to_ndc.compose(to_ndc)
        return world_to_ndc.transform_points(points, eps=eps)

    def transform_points_screen(
        self,
        points: jnp.ndarray,
        eps: Optional[float] = None,
        with_xyflip: bool = True,
        **kwargs,
    ) -> jnp.ndarray:
        points_ndc = self.transform_points_ndc(points, eps=eps, **kwargs)
        image_size = kwargs.get("image_size", self.get_image_size())
        return get_ndc_to_screen_transform(
            self, with_xyflip=with_xyflip, image_size=image_size
        ).transform_points(points_ndc, eps=eps)

    def get_image_size(self):
        return getattr(self, "image_size", None)

    def get_znear(self):
        return getattr(self, "znear", None)

    def get_principal_point(self, **kwargs) -> jnp.ndarray:
        return kwargs.get("principal_point", getattr(self, "principal_point", None))

    def __getitem__(self, index):
        n = len(self)
        if isinstance(index, int):
            # jnp indexing clamps out-of-range silently; the reference's
            # TensorAccessor raises, so mirror the strict bounds check
            if not -n <= index < n:
                raise IndexError(
                    f"index {index} out of range for batch size {n}"
                )
            index = [index]
        if isinstance(index, (list, tuple)):
            if any(
                isinstance(i, int) and not -n <= i < n for i in index
            ):
                raise IndexError(
                    f"index {index} out of range for batch size {n}"
                )
            index = jnp.asarray(index)
        return jax.tree_util.tree_map(lambda x: x[index], self)

    def clone(self):
        return self

    def to(self, *args, **kwargs):
        return self


# --------------------------------------------------------------------------- #
# FoV cameras
# --------------------------------------------------------------------------- #


@struct.dataclass
class FoVPerspectiveCameras(CamerasBase):
    """OpenGL-style perspective camera (reference cameras.py:510).

    NDC z maps view-space depth to [0, 1] between znear and zfar; z sign is
    +1 (right-handed throughout, unlike OpenGL).
    """

    R: jnp.ndarray
    T: jnp.ndarray
    znear: jnp.ndarray  # (N,)
    zfar: jnp.ndarray  # (N,)
    fov: jnp.ndarray  # (N,) radians internally
    aspect_ratio: jnp.ndarray  # (N,)
    degrees: bool = struct.field(pytree_node=False, default=True)
    K: Optional[jnp.ndarray] = None

    @classmethod
    def create(
        cls,
        znear=1.0,
        zfar=100.0,
        aspect_ratio=1.0,
        fov=60.0,
        degrees: bool = True,
        R: Optional[jnp.ndarray] = None,
        T: Optional[jnp.ndarray] = None,
        K: Optional[jnp.ndarray] = None,
    ) -> "FoVPerspectiveCameras":
        R = jnp.asarray(R, jnp.float32) if R is not None else jnp.eye(3)[None]
        if R.ndim == 2:
            R = R[None]
        T = jnp.asarray(T, jnp.float32) if T is not None else jnp.zeros((1, 3))
        if T.ndim == 1:
            T = T[None]
        znear = _to_batch(znear)
        zfar = _to_batch(zfar)
        fov = _to_batch(fov)
        aspect_ratio = _to_batch(aspect_ratio)
        R, T, znear, zfar, fov, aspect_ratio = _broadcast_batch(
            R, T, znear, zfar, fov, aspect_ratio
        )
        return cls(
            R=R, T=T, znear=znear, zfar=zfar, fov=fov,
            aspect_ratio=aspect_ratio, degrees=degrees, K=K,
        )

    def compute_projection_matrix(
        self, znear, zfar, fov, aspect_ratio, degrees: bool
    ) -> jnp.ndarray:
        N = len(self)
        if degrees:
            fov = (math.pi / 180.0) * fov
        tanHalfFov = jnp.tan(fov / 2.0)
        max_y = tanHalfFov * znear
        max_x = max_y * aspect_ratio
        K = jnp.zeros((N, 4, 4), jnp.float32)
        K = K.at[:, 0, 0].set(znear / max_x)
        K = K.at[:, 1, 1].set(znear / max_y)
        K = K.at[:, 3, 2].set(1.0)
        K = K.at[:, 2, 2].set(zfar / (zfar - znear))
        K = K.at[:, 2, 3].set(-(zfar * znear) / (zfar - znear))
        return K

    def get_projection_transform(self, **kwargs) -> Transform3d:
        K = kwargs.get("K", self.K)
        if K is None:
            K = self.compute_projection_matrix(
                kwargs.get("znear", self.znear),
                kwargs.get("zfar", self.zfar),
                kwargs.get("fov", self.fov),
                kwargs.get("aspect_ratio", self.aspect_ratio),
                kwargs.get("degrees", self.degrees),
            )
        # Row-vector convention: transpose the column-convention K.
        return Transform3d(matrix=jnp.swapaxes(K, -1, -2))

    def unproject_points(
        self,
        xy_depth: jnp.ndarray,
        world_coordinates: bool = True,
        scaled_depth_input: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        if world_coordinates:
            to_cam = self.get_full_projection_transform(**kwargs)
        else:
            to_cam = self.get_projection_transform(**kwargs)
        if scaled_depth_input:
            xy_sdepth = xy_depth
        else:
            # Convert view-space depth to NDC z: z_ndc = f/(f-n) - fn/((f-n) z)
            znear = kwargs.get("znear", self.znear)[:, None, None]
            zfar = kwargs.get("zfar", self.zfar)[:, None, None]
            z = xy_depth[..., 2:]
            sdepth = (zfar / (zfar - znear)) - (zfar * znear) / ((zfar - znear) * z)
            xy_sdepth = jnp.concatenate([xy_depth[..., :2], sdepth], axis=-1)
        return to_cam.inverse().transform_points(xy_sdepth)

    def is_perspective(self) -> bool:
        return True

    def in_ndc(self) -> bool:
        return True


@struct.dataclass
class FoVOrthographicCameras(CamerasBase):
    """OpenGL-style orthographic camera (reference cameras.py:796)."""

    R: jnp.ndarray
    T: jnp.ndarray
    znear: jnp.ndarray
    zfar: jnp.ndarray
    max_y: jnp.ndarray
    min_y: jnp.ndarray
    max_x: jnp.ndarray
    min_x: jnp.ndarray
    scale_xyz: jnp.ndarray  # (N, 3)
    K: Optional[jnp.ndarray] = None

    @classmethod
    def create(
        cls,
        znear=1.0,
        zfar=100.0,
        max_y=1.0,
        min_y=-1.0,
        max_x=1.0,
        min_x=-1.0,
        scale_xyz=((1.0, 1.0, 1.0),),
        R: Optional[jnp.ndarray] = None,
        T: Optional[jnp.ndarray] = None,
        K: Optional[jnp.ndarray] = None,
    ) -> "FoVOrthographicCameras":
        R = jnp.asarray(R, jnp.float32) if R is not None else jnp.eye(3)[None]
        if R.ndim == 2:
            R = R[None]
        T = jnp.asarray(T, jnp.float32) if T is not None else jnp.zeros((1, 3))
        if T.ndim == 1:
            T = T[None]
        args = [_to_batch(a) for a in (znear, zfar, max_y, min_y, max_x, min_x)]
        scale = _to_batch(scale_xyz, last_dim=3)
        R, T, znear, zfar, max_y, min_y, max_x, min_x, scale = _broadcast_batch(
            R, T, *args, scale
        )
        return cls(
            R=R, T=T, znear=znear, zfar=zfar, max_y=max_y, min_y=min_y,
            max_x=max_x, min_x=min_x, scale_xyz=scale, K=K,
        )

    def compute_projection_matrix(
        self, znear, zfar, max_x, min_x, max_y, min_y, scale_xyz
    ) -> jnp.ndarray:
        N = len(self)
        K = jnp.zeros((N, 4, 4), jnp.float32)
        K = K.at[:, 0, 0].set((2.0 / (max_x - min_x)) * scale_xyz[:, 0])
        K = K.at[:, 1, 1].set((2.0 / (max_y - min_y)) * scale_xyz[:, 1])
        K = K.at[:, 0, 3].set(-(max_x + min_x) / (max_x - min_x))
        K = K.at[:, 1, 3].set(-(max_y + min_y) / (max_y - min_y))
        K = K.at[:, 2, 2].set((1.0 / (zfar - znear)) * scale_xyz[:, 2])
        K = K.at[:, 2, 3].set(-znear / (zfar - znear))
        K = K.at[:, 3, 3].set(1.0)
        return K

    def get_projection_transform(self, **kwargs) -> Transform3d:
        K = kwargs.get("K", self.K)
        if K is None:
            K = self.compute_projection_matrix(
                kwargs.get("znear", self.znear),
                kwargs.get("zfar", self.zfar),
                kwargs.get("max_x", self.max_x),
                kwargs.get("min_x", self.min_x),
                kwargs.get("max_y", self.max_y),
                kwargs.get("min_y", self.min_y),
                kwargs.get("scale_xyz", self.scale_xyz),
            )
        return Transform3d(matrix=jnp.swapaxes(K, -1, -2))

    def unproject_points(
        self,
        xy_depth: jnp.ndarray,
        world_coordinates: bool = True,
        scaled_depth_input: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        if world_coordinates:
            to_cam = self.get_full_projection_transform(**kwargs)
        else:
            to_cam = self.get_projection_transform(**kwargs)
        if scaled_depth_input:
            xy_sdepth = xy_depth
        else:
            znear = kwargs.get("znear", self.znear)[:, None, None]
            zfar = kwargs.get("zfar", self.zfar)[:, None, None]
            scale_z = kwargs.get("scale_xyz", self.scale_xyz)[:, None, 2:]
            sdepth = (xy_depth[..., 2:] * scale_z - znear) / (zfar - znear)
            xy_sdepth = jnp.concatenate([xy_depth[..., :2], sdepth], axis=-1)
        return to_cam.inverse().transform_points(xy_sdepth)

    def is_perspective(self) -> bool:
        return False

    def in_ndc(self) -> bool:
        return True


# --------------------------------------------------------------------------- #
# SfM-style cameras
# --------------------------------------------------------------------------- #


def _get_sfm_calibration_matrix(
    N: int,
    focal_length: jnp.ndarray,
    principal_point: jnp.ndarray,
    orthographic: bool,
) -> jnp.ndarray:
    if focal_length.ndim == 2 and focal_length.shape[1] == 2:
        fx, fy = focal_length[:, 0], focal_length[:, 1]
    else:
        fx = fy = focal_length.reshape(-1)
    px, py = principal_point[:, 0], principal_point[:, 1]
    K = jnp.zeros((N, 4, 4), jnp.float32)
    K = K.at[:, 0, 0].set(fx)
    K = K.at[:, 1, 1].set(fy)
    if orthographic:
        K = K.at[:, 0, 3].set(px)
        K = K.at[:, 1, 3].set(py)
        K = K.at[:, 2, 2].set(1.0)
        K = K.at[:, 3, 3].set(1.0)
    else:
        K = K.at[:, 0, 2].set(px)
        K = K.at[:, 1, 2].set(py)
        K = K.at[:, 3, 2].set(1.0)
        K = K.at[:, 2, 3].set(1.0)
    return K


class _SfMCameraMixin(CamerasBase):
    """Shared NDC/screen handling for Perspective/Orthographic cameras."""

    def in_ndc(self) -> bool:
        return self._in_ndc

    def get_ndc_camera_transform(self, **kwargs) -> Transform3d:
        if self.in_ndc():
            return Transform3d.create()
        # Screen-space camera: undo the principal point (defined in image
        # space), then rescale to NDC.
        N = len(self)
        pp = kwargs.get("principal_point", self.principal_point)
        fix = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))
        fix = fix.at[:, :2, 3].set(-2.0 * pp)
        fix_t = Transform3d(matrix=jnp.swapaxes(fix, -1, -2))
        image_size = kwargs.get("image_size", self.get_image_size())
        return fix_t.compose(
            get_screen_to_ndc_transform(self, with_xyflip=False, image_size=image_size)
        )

    def unproject_points(
        self,
        xy_depth: jnp.ndarray,
        world_coordinates: bool = True,
        from_ndc: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        # Invert the SfM intrinsics analytically: perspective maps
        # x_ndc = fx X / Z + px (depth preserved in z); orthographic maps
        # x_ndc = fx X + px.
        pts = xy_depth
        if pts.ndim == 2:
            pts = pts[None]
        if from_ndc:
            # Undo the projection-space -> NDC adjustment first.
            ndc_t = self.get_ndc_camera_transform(**kwargs)
            pts = ndc_t.inverse().transform_points(pts)
        fl = _to_batch(kwargs.get("focal_length", self.focal_length), last_dim=2)
        pp = kwargs.get("principal_point", self.principal_point)
        if fl.shape[-1] == 1:
            fl = jnp.concatenate([fl, fl], axis=-1)
        if self.is_perspective():
            z = pts[..., 2:]
            xy = (pts[..., :2] - pp[:, None, :]) * z / fl[:, None, :]
        else:
            xy = (pts[..., :2] - pp[:, None, :]) / fl[:, None, :]
        cam_pts = jnp.concatenate([xy, pts[..., 2:]], axis=-1)
        if world_coordinates:
            w2v = self.get_world_to_view_transform(**kwargs)
            cam_pts = w2v.inverse().transform_points(cam_pts)
        if xy_depth.ndim == 2:
            cam_pts = cam_pts[0]
        return cam_pts


@struct.dataclass
class PerspectiveCameras(_SfMCameraMixin):
    """SfM-style perspective camera (reference cameras.py:1033).

    Projection: x_ndc = fx * X / Z + px; z is passed through as depth.
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray  # (N, 2) or (N, 1)
    principal_point: jnp.ndarray  # (N, 2)
    image_size: Optional[jnp.ndarray] = None  # (N, 2) (height, width)
    K: Optional[jnp.ndarray] = None
    _in_ndc: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls,
        focal_length=1.0,
        principal_point=((0.0, 0.0),),
        R: Optional[jnp.ndarray] = None,
        T: Optional[jnp.ndarray] = None,
        K: Optional[jnp.ndarray] = None,
        image_size=None,
        in_ndc: bool = True,
    ) -> "PerspectiveCameras":
        R = jnp.asarray(R, jnp.float32) if R is not None else jnp.eye(3)[None]
        if R.ndim == 2:
            R = R[None]
        T = jnp.asarray(T, jnp.float32) if T is not None else jnp.zeros((1, 3))
        if T.ndim == 1:
            T = T[None]
        fl = _to_batch(focal_length, last_dim=2)
        pp = _to_batch(principal_point, last_dim=2)
        R, T, fl, pp = _broadcast_batch(R, T, fl, pp)
        img = None
        if image_size is not None:
            img = _to_batch(image_size, last_dim=2)
            img = jnp.broadcast_to(img, (R.shape[0], 2))
        return cls(
            R=R, T=T, focal_length=fl, principal_point=pp,
            image_size=img, K=K, _in_ndc=in_ndc,
        )

    def get_projection_transform(self, **kwargs) -> Transform3d:
        K = kwargs.get("K", self.K)
        if K is None:
            fl = _to_batch(kwargs.get("focal_length", self.focal_length), last_dim=2)
            pp = kwargs.get("principal_point", self.principal_point)
            K = _get_sfm_calibration_matrix(len(self), fl, pp, orthographic=False)
        return Transform3d(matrix=jnp.swapaxes(K, -1, -2))

    def is_perspective(self) -> bool:
        return True


@struct.dataclass
class OrthographicCameras(_SfMCameraMixin):
    """SfM-style orthographic camera (reference cameras.py:1274)."""

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray
    principal_point: jnp.ndarray
    image_size: Optional[jnp.ndarray] = None
    K: Optional[jnp.ndarray] = None
    _in_ndc: bool = struct.field(pytree_node=False, default=True)

    create = classmethod(PerspectiveCameras.create.__func__)

    def get_projection_transform(self, **kwargs) -> Transform3d:
        K = kwargs.get("K", self.K)
        if K is None:
            fl = _to_batch(kwargs.get("focal_length", self.focal_length), last_dim=2)
            pp = kwargs.get("principal_point", self.principal_point)
            K = _get_sfm_calibration_matrix(len(self), fl, pp, orthographic=True)
        return Transform3d(matrix=jnp.swapaxes(K, -1, -2))

    def is_perspective(self) -> bool:
        return False


# --------------------------------------------------------------------------- #
# View helpers
# --------------------------------------------------------------------------- #


def camera_position_from_spherical_angles(
    distance, elevation, azimuth, degrees: bool = True
) -> jnp.ndarray:
    """Camera position on a sphere around the origin (reference :1605)."""
    dist = _to_batch(distance)
    elev = _to_batch(elevation)
    azim = _to_batch(azimuth)
    dist, elev, azim = _broadcast_batch(dist, elev, azim)
    if degrees:
        elev = elev * (math.pi / 180.0)
        azim = azim * (math.pi / 180.0)
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    return jnp.stack([x, y, z], axis=1).reshape(-1, 3)


def _normalize(v, eps=1e-5):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def look_at_rotation(
    camera_position, at=((0, 0, 0),), up=((0, 1, 0),)
) -> jnp.ndarray:
    """World->view rotation for a camera looking at `at` (reference :1647)."""
    camera_position = _to_batch(camera_position, last_dim=3)
    at = _to_batch(at, last_dim=3)
    up = _to_batch(up, last_dim=3)
    camera_position, at, up = _broadcast_batch(camera_position, at, up)
    z_axis = _normalize(at - camera_position)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    # Handle up || z: replace degenerate x axis.
    is_close = jnp.all(jnp.abs(x_axis) < 5e-3, axis=1, keepdims=True)
    replacement = _normalize(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(is_close, replacement, x_axis)
    R = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # rows
    return jnp.swapaxes(R, -1, -2)


def look_at_view_transform(
    dist=1.0,
    elev=0.0,
    azim=0.0,
    degrees: bool = True,
    eye=None,
    at=((0, 0, 0),),
    up=((0, 1, 0),),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(R, T) for a camera orbiting `at` (reference cameras.py:1697)."""
    at = _to_batch(at, last_dim=3)
    up = _to_batch(up, last_dim=3)
    if eye is not None:
        C = _to_batch(eye, last_dim=3)
        C, at, up = _broadcast_batch(C, at, up)
    else:
        C = camera_position_from_spherical_angles(dist, elev, azim, degrees=degrees)
        C, at, up = _broadcast_batch(C, at, up)
        C = C + at
    R = look_at_rotation(C, at, up)
    T = -jnp.einsum(
        "nij,nj->ni", jnp.swapaxes(R, -1, -2), C,
    )
    return R, T


def get_ndc_to_screen_transform(
    cameras, with_xyflip: bool = False, image_size=None
) -> Transform3d:
    """NDC -> screen (+X right, +Y down, origin top-left); reference :1763."""
    if image_size is None:
        raise ValueError(
            "For NDC to screen conversion, image_size=(height, width) needs "
            "to be specified."
        )
    N = len(cameras)
    image_size = jnp.asarray(image_size, jnp.float32).reshape(-1, 2)
    height, width = image_size[:, 0], image_size[:, 1]
    scale = jnp.min(image_size, axis=1) / 2.0
    K = jnp.zeros((image_size.shape[0], 4, 4), jnp.float32)
    K = K.at[:, 0, 0].set(scale)
    K = K.at[:, 1, 1].set(scale)
    K = K.at[:, 0, 3].set(-1.0 * width / 2.0)
    K = K.at[:, 1, 3].set(-1.0 * height / 2.0)
    K = K.at[:, 2, 2].set(1.0)
    K = K.at[:, 3, 3].set(1.0)
    transform = Transform3d(matrix=jnp.swapaxes(K, -1, -2))
    if with_xyflip:
        xyflip = jnp.diag(jnp.asarray([-1.0, -1.0, 1.0, 1.0]))
        xyflip = jnp.broadcast_to(xyflip, (K.shape[0], 4, 4))
        transform = transform.compose(Transform3d(matrix=xyflip))
    return transform


def get_screen_to_ndc_transform(
    cameras, with_xyflip: bool = False, image_size=None
) -> Transform3d:
    """Screen -> NDC (reference :1833)."""
    return get_ndc_to_screen_transform(
        cameras, with_xyflip=with_xyflip, image_size=image_size
    ).inverse()


def try_get_projection_transform(cameras, cameras_kwargs) -> Optional[Transform3d]:
    """Projection transform if the camera is linear, else None (ref :1869)."""
    try:
        return cameras.get_projection_transform(**cameras_kwargs)
    except NotImplementedError:
        return None


# Aliases matching the reference's OpenGL/SfM legacy names.
OpenGLPerspectiveCameras = FoVPerspectiveCameras
OpenGLOrthographicCameras = FoVOrthographicCameras
SfMPerspectiveCameras = PerspectiveCameras
SfMOrthographicCameras = OrthographicCameras
