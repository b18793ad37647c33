"""Voxel grids: dense + tensor-factorized (TensoRF CP/VM), full surface.

Parity: reference implicitron/models/implicit_function/voxel_grid.py
(`VoxelGridBase` :47, `FullResolutionVoxelGrid` :369,
`CPFactorizedVoxelGrid` :449, `VMFactorizedVoxelGrid` :583,
`VoxelGridModule` :808) and the interpolation helpers in
implicitron/models/implicit_function/utils.py:97-189.

TPU-first design notes:
- Grid *values* are plain ``{name: jnp.ndarray}`` dicts (pytrees), each
  array carrying a leading ``n_grids`` dimension; the grid classes are
  stateless configs whose methods are pure functions of those values.
  This is the JAX equivalent of the reference's ``values_type``
  dataclasses + ``torch.nn.Module`` parameters.
- Sampling routes through ops/grid_sample (gather + lerp on the VPU);
  the factorized grids turn volume lookups into tiny plane/line gathers
  plus an MXU matmul against the basis matrix.
- Resolution changes / crops happen *between* jitted steps (epoch
  boundaries) and therefore run host-side on concrete arrays, returning
  new value dicts; re-jit is automatic because shapes change.
- ``torch.nn.functional.interpolate`` is reproduced by per-axis
  resize-weight matrices (``interpolate_tensor``): each axis resize is a
  dense (n_out, n_in) matmul, which XLA maps straight onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, ClassVar, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ....ops.grid_sample import grid_sample
from ...tools.config import ReplaceableBase, registry

# --------------------------------------------------------------------------- #
# Interpolation helpers (reference implicit_function/utils.py:97-189).
# All take points with a leading n_grids dim and return (G, P, C).
# --------------------------------------------------------------------------- #


# One-hot interpolation weights: for the SMALL axes of factorized grids
# (<= _ONEHOT_MAX_AXIS), linear interpolation is expressed as a dense
# (P, n) weight matrix contracted on the MXU instead of corner GATHERS.
# Rationale (round 5, EXP_VOXEL): the voxel train step was op-count
# bound — the gather-based grid_sample emitted ~60 equations and several
# tiny gather kernels per plane sample, ~1,830 equations for the field
# alone; a one-hot weight build is ~8 vector ops and one GEMM.
_ONEHOT_MAX_AXIS = 512


def _onehot_lerp_weights(coord, size, align_corners, padding_mode):
    """(..., ) coords in [-1, 1] -> (..., size) linear-interp weights."""
    from ....ops.grid_sample import _unnormalize

    x = _unnormalize(coord, size, align_corners)
    x0 = jnp.floor(x)
    w1 = x - x0
    i0 = x0.astype(jnp.int32)
    if padding_mode == "border":
        v0 = jnp.ones_like(w1, bool)
        v1 = v0
    else:  # zeros
        v0 = (i0 >= 0) & (i0 <= size - 1)
        v1 = (i0 + 1 >= 0) & (i0 + 1 <= size - 1)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i0 + 1, 0, size - 1)
    iota = jnp.arange(size, dtype=jnp.int32)
    oh0 = (iota == i0c[..., None]).astype(coord.dtype)
    oh1 = (iota == i1c[..., None]).astype(coord.dtype)
    return (
        oh0 * jnp.where(v0, 1.0 - w1, 0.0)[..., None]
        + oh1 * jnp.where(v1, w1, 0.0)[..., None]
    )


def interpolate_line(
    points: jnp.ndarray,  # (G, P, 1) in [-1, 1]
    source: jnp.ndarray,  # (G, C, W)
    **kwargs,
) -> jnp.ndarray:
    """1D linear interpolation along W (reference utils.py:97)."""
    W = source.shape[-1]
    mode = kwargs.get("mode", "bilinear")
    if W <= _ONEHOT_MAX_AXIS and mode in ("bilinear", "trilinear"):
        wts = _onehot_lerp_weights(
            points[..., 0], W,
            kwargs.get("align_corners", False),
            kwargs.get("padding_mode", "zeros"),
        )  # (G, P, W)
        return jnp.einsum(
            "gpw,gcw->gpc", wts, source,
            precision=jax.lax.Precision.HIGHEST,
        )
    expansion = jnp.zeros_like(points)
    pts = jnp.concatenate([points, expansion], axis=-1)  # (G, P, 2)
    out = grid_sample(source[:, :, None, :], pts[:, :, None, :], **kwargs)
    return jnp.moveaxis(out[:, :, :, 0], 1, 2)  # (G, P, C)


def interpolate_plane(
    points: jnp.ndarray,  # (G, P, 2) in [-1, 1]
    source: jnp.ndarray,  # (G, C, W, H)
    **kwargs,
) -> jnp.ndarray:
    """2D interpolation; source is (features, width, height), so swap the
    spatial axes into grid_sample's (H, W) convention (reference :130)."""
    Wd, Hd = source.shape[2], source.shape[3]
    mode = kwargs.get("mode", "bilinear")
    if (
        Wd <= _ONEHOT_MAX_AXIS
        and Hd <= _ONEHOT_MAX_AXIS
        and mode in ("bilinear", "trilinear")
    ):
        ac = kwargs.get("align_corners", False)
        pm = kwargs.get("padding_mode", "zeros")
        wx = _onehot_lerp_weights(points[..., 0], Wd, ac, pm)  # (G, P, W)
        wy = _onehot_lerp_weights(points[..., 1], Hd, ac, pm)  # (G, P, H)
        # two-stage contraction rides the MXU: (G,P,W)x(G,C,W,H)->(G,P,C,H)
        tmp = jnp.einsum(
            "gpw,gcwh->gpch", wx, source,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.einsum(
            "gph,gpch->gpc", wy, tmp,
            precision=jax.lax.Precision.HIGHEST,
        )
    src = jnp.swapaxes(source, 2, 3)  # (G, C, H, W)
    out = grid_sample(src, points[:, :, None, :], **kwargs)
    return jnp.moveaxis(out[:, :, :, 0], 1, 2)


def interpolate_volume(
    points: jnp.ndarray,  # (G, P, 3) in [-1, 1]
    source: jnp.ndarray,  # (G, C, W, H, D)
    **kwargs,
) -> jnp.ndarray:
    """3D interpolation; (features, W, H, D) -> grid_sample's (D, H, W)
    (reference :161)."""
    if kwargs.get("mode") == "trilinear":
        kwargs = dict(kwargs, mode="bilinear")
    src = jnp.transpose(source, (0, 1, 4, 3, 2))  # (G, C, D, H, W)
    out = grid_sample(src, points[:, :, None, None, :], **kwargs)
    return jnp.moveaxis(out[:, :, :, 0, 0], 1, 2)


# --------------------------------------------------------------------------- #
# torch.nn.functional.interpolate equivalent, built from per-axis
# resize-weight matrices (each axis resize = one (n_out, n_in) matmul).
# --------------------------------------------------------------------------- #


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (torch/PIL use a=-0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * (ax**3 - 5.0 * ax**2 + 8.0 * ax - 4.0), 0.0),
    )
    return w


def _resize_matrix(
    n_in: int,
    n_out: int,
    mode: str,
    align_corners: bool,
    antialias: bool = False,
) -> np.ndarray:
    """(n_out, n_in) row-stochastic weights matching
    torch.nn.functional.interpolate along one axis."""
    W = np.zeros((n_out, n_in), dtype=np.float64)
    i = np.arange(n_out, dtype=np.float64)
    scale = n_in / n_out

    def acc(rows, cols, w):
        np.add.at(W, (rows, np.clip(cols, 0, n_in - 1)), w)

    if mode == "nearest":
        idx = np.floor(i * scale).astype(np.int64)
        acc(np.arange(n_out), idx, np.ones(n_out))
    elif mode == "nearest-exact":
        idx = np.floor((i + 0.5) * scale).astype(np.int64)
        acc(np.arange(n_out), idx, np.ones(n_out))
    elif mode == "area":
        # adaptive average pooling semantics
        start = np.floor(i * n_in / n_out).astype(np.int64)
        end = np.ceil((i + 1) * n_in / n_out).astype(np.int64)
        for r in range(n_out):
            W[r, start[r] : end[r]] = 1.0 / (end[r] - start[r])
    elif mode in ("linear", "bicubic"):
        if align_corners:
            src = i * (n_in - 1) / max(n_out - 1, 1) if n_out > 1 else i * 0.0
        else:
            src = (i + 0.5) * scale - 0.5
        support = 1.0 if mode == "linear" else 2.0
        kern: Callable[[np.ndarray], np.ndarray] = (
            (lambda x: np.maximum(0.0, 1.0 - np.abs(x)))
            if mode == "linear"
            else _cubic_kernel
        )
        # antialias stretches the kernel by the downscale factor
        kscale = max(scale, 1.0) if (antialias and scale > 1.0) else 1.0
        half = support * kscale
        lo = np.floor(src - half).astype(np.int64)
        n_taps = int(np.ceil(2 * half)) + 2
        rows = np.repeat(np.arange(n_out), n_taps)
        cols = (lo[:, None] + np.arange(n_taps)[None, :]).reshape(-1)
        x = (cols.reshape(n_out, n_taps) - src[:, None]) / kscale
        w = kern(x)
        if not antialias and mode == "linear":
            # torch clamps source coords to the valid range at borders
            pass
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        acc(rows, cols, w.reshape(-1))
    else:
        raise ValueError(f"Unsupported interpolate mode: {mode}")
    return W


def interpolate_tensor(
    x: jnp.ndarray,
    size: Tuple[int, ...],
    mode: str = "linear",
    align_corners: bool = True,
    antialias: bool = False,
) -> jnp.ndarray:
    """torch.nn.functional.interpolate equivalent: resizes the trailing
    ``len(size)`` axes of ``x``. 'linear' auto-promotes to bi/trilinear.
    Each axis resize is a dense matmul (MXU-friendly; resolutions are
    small and this runs only at epoch boundaries)."""
    n_sp = len(size)
    out = x
    for ax_off, n_out in enumerate(size):
        axis = x.ndim - n_sp + ax_off
        n_in = out.shape[axis]
        if n_in == n_out:
            continue
        M = jnp.asarray(
            _resize_matrix(n_in, n_out, mode, align_corners, antialias),
            dtype=out.dtype,
        )
        out = jnp.moveaxis(
            jnp.tensordot(out, M, axes=[[axis], [1]]), -1, axis
        )
    return out


# --------------------------------------------------------------------------- #
# Grid classes.
# --------------------------------------------------------------------------- #

VoxelGridValues = Dict[str, jnp.ndarray]  # each value: (n_grids, *shape)


@dataclasses.dataclass
class VoxelGridValuesBase:
    """Typed view over the plain value dict (reference voxel_grid.py:43).

    The canonical in-library representation is the plain dict (a JAX
    pytree the optimizer/trainer transforms freely); these dataclasses
    give reference-API users the same named-field containers.  Both are
    accepted anywhere a `grid_values` argument appears.
    """

    def as_dict(self) -> VoxelGridValues:
        return {
            k: v
            for k, v in dataclasses.asdict(self).items()
            if v is not None
        }


@dataclasses.dataclass
class FullResolutionVoxelGridValues(VoxelGridValuesBase):
    voxel_grid: jnp.ndarray


@dataclasses.dataclass
class CPFactorizedVoxelGridValues(VoxelGridValuesBase):
    vector_components_x: jnp.ndarray
    vector_components_y: jnp.ndarray
    vector_components_z: jnp.ndarray
    basis_matrix: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class VMFactorizedVoxelGridValues(VoxelGridValuesBase):
    vector_components_x: jnp.ndarray
    vector_components_y: jnp.ndarray
    vector_components_z: jnp.ndarray
    matrix_components_xy: jnp.ndarray
    matrix_components_yz: jnp.ndarray
    matrix_components_xz: jnp.ndarray
    basis_matrix: Optional[jnp.ndarray] = None


def _values_as_dict(grid_values) -> VoxelGridValues:
    if isinstance(grid_values, VoxelGridValuesBase):
        return grid_values.as_dict()
    return grid_values


@dataclasses.dataclass
class VoxelGridBase(ReplaceableBase):
    """Stateless voxel-grid config; values live in plain dicts
    (reference voxel_grid.py:47 `VoxelGridBase`).

    Grids are indexed by (features, x, y, z); out-of-grid queries follow
    ``padding``. ``resolution_changes`` maps training epochs to
    [width, height, depth] resolutions.
    """

    align_corners: bool = True
    padding: str = "zeros"
    mode: str = "bilinear"
    n_features: int = 1
    resolution_changes: Dict[int, Any] = dataclasses.field(
        default_factory=lambda: {0: [128, 128, 128]}
    )

    def __post_init__(self):
        if 0 not in self.resolution_changes:
            raise ValueError(
                "There has to be key `0` in `resolution_changes`."
            )

    # -- evaluation ------------------------------------------------------- #

    def evaluate_world(
        self,
        points: jnp.ndarray,  # (n_grids, ..., 3) world coords
        grid_values: VoxelGridValues,
        locator: "_GridLocator",
    ) -> jnp.ndarray:
        """Evaluate at world points (reference :87)."""
        points_local = locator.world_to_local_coords(points)
        return self.evaluate_local(points_local, _values_as_dict(grid_values))

    def evaluate_local(
        self, points: jnp.ndarray, grid_values: VoxelGridValues
    ) -> jnp.ndarray:
        """Evaluate at local ([-1, 1]^3) points -> (n_grids, ..., n_features)."""
        raise NotImplementedError()

    # -- shapes / resolution ---------------------------------------------- #

    def get_shapes(self, epoch: int) -> Dict[str, Tuple[int, ...]]:
        """Shapes (without the n_grids dim) of the value tensors at `epoch`."""
        raise NotImplementedError()

    def get_resolution(self, epoch: int) -> List[int]:
        """[width, height, depth] the grid should have at `epoch`
        (reference :142)."""
        last_change = 0
        for change_epoch in self.resolution_changes:
            if change_epoch <= epoch:
                last_change = max(last_change, change_epoch)
        return list(self.resolution_changes[last_change])

    @staticmethod
    def get_output_dim(args: Dict[str, Any]) -> int:
        return args["n_features"]

    def get_resolution_change_epochs(self) -> Tuple[int, ...]:
        return tuple(self.resolution_changes.keys())

    def get_align_corners(self) -> bool:
        return self.align_corners

    # -- functional parameter transforms ----------------------------------- #

    def change_resolution(
        self,
        grid_values: VoxelGridValues,
        *,
        epoch: Optional[int] = None,
        grid_values_with_wanted_resolution: Optional[VoxelGridValues] = None,
        mode: str = "linear",
        align_corners: bool = True,
        antialias: bool = False,
    ) -> Tuple[VoxelGridValues, bool]:
        """Resample value tensors to the epoch's resolution, or to the
        resolution of another value dict (reference :174). Pure function:
        returns (new values, changed?)."""
        if (epoch is None) == (grid_values_with_wanted_resolution is None):
            raise ValueError(
                "Exactly one of `epoch` or "
                "`grid_values_with_wanted_resolution` has to be defined."
            )
        if mode not in ("nearest", "bicubic", "linear", "area", "nearest-exact"):
            raise ValueError(
                "`mode` should be one of 'nearest' | 'bicubic' | 'linear'"
                " | 'area' | 'nearest-exact'"
            )

        def change_one(tensor, wanted):
            if tensor is None:
                return None
            if tuple(tensor.shape[2:]) == tuple(wanted):
                return tensor
            return interpolate_tensor(
                tensor,
                tuple(wanted),
                mode=mode,
                align_corners=align_corners,
                antialias=antialias,
            )

        if epoch is not None:
            if epoch not in self.resolution_changes:
                return grid_values, False
            wanted_shapes = self.get_shapes(epoch=epoch)
            new_values = {
                name: change_one(grid_values[name], shape[1:])
                for name, shape in wanted_shapes.items()
            }
        else:
            wanted = grid_values_with_wanted_resolution
            new_values = {
                name: change_one(
                    grid_values.get(name),
                    tensor.shape[2:],
                )
                for name, tensor in wanted.items()
                if tensor is not None
            }
        return new_values, True

    def crop_world(
        self,
        min_point_world: jnp.ndarray,  # (3,)
        max_point_world: jnp.ndarray,  # (3,)
        grid_values: VoxelGridValues,
        volume_locator: "_GridLocator",
    ) -> VoxelGridValues:
        """Crop to a world-space bounding box, keeping every voxel needed
        to reconstruct the corners (reference :286). Host-side."""
        min_local = volume_locator.world_to_local_coords(
            min_point_world[None]
        )[0]
        max_local = volume_locator.world_to_local_coords(
            max_point_world[None]
        )[0]
        return self.crop_local(min_local, max_local, grid_values)

    def _crop_indices(
        self, min_point_local, max_point_local, resolution
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Shared voxel-index math for crop_local (reference :426-431)."""
        lo = np.clip(np.asarray(min_point_local, np.float64), -1, 1)
        hi = np.clip(np.asarray(max_point_local, np.float64), -1, 1)
        res = np.asarray(resolution, np.float64)
        lo01, hi01 = (lo + 1) / 2, (hi + 1) / 2
        if self.align_corners:
            mins = np.floor(lo01 * (res - 1)).astype(np.int64)
            maxs = np.ceil(hi01 * (res - 1)).astype(np.int64)
        else:
            mins = np.floor(lo01 * res - 0.5).astype(np.int64)
            maxs = np.ceil(hi01 * res - 0.5).astype(np.int64)
        return mins, maxs

    def crop_local(
        self,
        min_point_local: jnp.ndarray,
        max_point_local: jnp.ndarray,
        grid_values: VoxelGridValues,
    ) -> VoxelGridValues:
        raise NotImplementedError()


@registry.register
@dataclasses.dataclass
class FullResolutionVoxelGrid(VoxelGridBase):
    """Dense (features, width, height, depth) grid (reference :369).
    Values: {"voxel_grid": (G, F, W, H, D)}."""

    values_type = FullResolutionVoxelGridValues

    def evaluate_local(self, points, grid_values):
        grid_values = _values_as_dict(grid_values)
        recorded_shape = points.shape
        pts = points.reshape(points.shape[0], -1, points.shape[-1])
        out = interpolate_volume(
            pts,
            grid_values["voxel_grid"],
            align_corners=self.align_corners,
            padding_mode=self.padding,
            mode=self.mode,
        )
        return out.reshape(*recorded_shape[:-1], -1)

    def get_shapes(self, epoch: int) -> Dict[str, Tuple[int, ...]]:
        width, height, depth = self.get_resolution(epoch)
        return {"voxel_grid": (self.n_features, width, height, depth)}

    def crop_local(self, min_point_local, max_point_local, grid_values):
        vg = grid_values["voxel_grid"]
        assert np.all(np.asarray(min_point_local) < np.asarray(max_point_local))
        (minx, miny, minz), (maxx, maxy, maxz) = self._crop_indices(
            min_point_local, max_point_local, vg.shape[2:5]
        )
        return {
            "voxel_grid": vg[
                :, :, minx : maxx + 1, miny : maxy + 1, minz : maxz + 1
            ]
        }


@registry.register
@dataclasses.dataclass
class CPFactorizedVoxelGrid(VoxelGridBase):
    """CANDECOMP/PARAFAC rank-R factorization (reference :449):
    grid = sum_r x_r (x) y_r (x) z_r, optionally matmul'd by a
    (R, n_features) basis matrix. Values: vector_components_{x,y,z}
    of shape (G, R, res) [+ basis_matrix (G, R, F)]."""

    values_type = CPFactorizedVoxelGridValues
    n_components: int = 24
    basis_matrix: bool = True

    def evaluate_local(self, points, grid_values):
        recorded_shape = points.shape
        pts = points.reshape(points.shape[0], -1, points.shape[-1])

        def factor(axis):
            i = {"x": 0, "y": 1, "z": 2}[axis]
            return interpolate_line(
                pts[..., i, None],
                grid_values["vector_components_" + axis],
                align_corners=self.align_corners,
                padding_mode=self.padding,
                mode=self.mode,
            )

        mult = factor("x") * factor("y") * factor("z")  # (G, P, R)
        if grid_values.get("basis_matrix") is not None:
            result = jnp.einsum(
                "gpr,grf->gpf",
                mult,
                grid_values["basis_matrix"],
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            result = mult.sum(axis=-1, keepdims=True)
        return result.reshape(*recorded_shape[:-1], -1)

    def get_shapes(self, epoch: int) -> Dict[str, Tuple[int, ...]]:
        if self.basis_matrix is False and self.n_features != 1:
            raise ValueError(
                "Cannot set basis_matrix=False and n_features to != 1"
            )
        width, height, depth = self.get_resolution(epoch)
        shape_dict = {
            "vector_components_x": (self.n_components, width),
            "vector_components_y": (self.n_components, height),
            "vector_components_z": (self.n_components, depth),
        }
        if self.basis_matrix:
            shape_dict["basis_matrix"] = (self.n_components, self.n_features)
        return shape_dict

    def crop_local(self, min_point_local, max_point_local, grid_values):
        assert np.all(np.asarray(min_point_local) < np.asarray(max_point_local))
        width = grid_values["vector_components_x"].shape[-1]
        height = grid_values["vector_components_y"].shape[-1]
        depth = grid_values["vector_components_z"].shape[-1]
        (minx, miny, minz), (maxx, maxy, maxz) = self._crop_indices(
            min_point_local, max_point_local, (width, height, depth)
        )
        out = {
            "vector_components_x": grid_values["vector_components_x"][
                :, :, minx : maxx + 1
            ],
            "vector_components_y": grid_values["vector_components_y"][
                :, :, miny : maxy + 1
            ],
            "vector_components_z": grid_values["vector_components_z"][
                :, :, minz : maxz + 1
            ],
        }
        if grid_values.get("basis_matrix") is not None:
            out["basis_matrix"] = grid_values["basis_matrix"]
        return out


@registry.register
@dataclasses.dataclass
class VMFactorizedVoxelGrid(VoxelGridBase):
    """Vector-Matrix factorization (TensoRF, arXiv:2203.09517; reference
    :583): grid = xy (x) z + xz (x) y + yz (x) x. Values:
    matrix_components_{xy,yz,xz} (G, R, r0, r1),
    vector_components_{x,y,z} (G, R, r2) [+ basis_matrix]."""

    values_type = VMFactorizedVoxelGridValues
    n_components: Optional[int] = None
    distribution_of_components: Optional[Tuple[int, int, int]] = None
    basis_matrix: bool = True

    def evaluate_local(self, points, grid_values):
        recorded_shape = points.shape
        pts = points.reshape(points.shape[0], -1, points.shape[-1])
        kw = dict(
            align_corners=self.align_corners,
            padding_mode=self.padding,
            mode=self.mode,
        )
        a = interpolate_plane(
            pts[..., :2], grid_values["matrix_components_xy"], **kw
        ) * interpolate_line(
            pts[..., 2:], grid_values["vector_components_z"], **kw
        )
        b = interpolate_plane(
            pts[..., jnp.array([0, 2])], grid_values["matrix_components_xz"], **kw
        ) * interpolate_line(
            pts[..., 1:2], grid_values["vector_components_y"], **kw
        )
        c = interpolate_plane(
            pts[..., 1:], grid_values["matrix_components_yz"], **kw
        ) * interpolate_line(
            pts[..., :1], grid_values["vector_components_x"], **kw
        )
        feats = jnp.concatenate([a, b, c], axis=-1)
        if grid_values.get("basis_matrix") is not None:
            result = jnp.einsum(
                "gpr,grf->gpf",
                feats,
                grid_values["basis_matrix"],
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            result = feats.sum(axis=-1, keepdims=True)
        return result.reshape(*recorded_shape[:-1], -1)

    def _distribution(self) -> List[int]:
        if self.distribution_of_components is None and self.n_components is None:
            raise ValueError(
                "You need to provide n_components or distribution_of_components"
            )
        if (
            self.distribution_of_components is not None
            and self.n_components is not None
        ):
            raise ValueError(
                "You cannot define n_components and distribution_of_components"
            )
        if self.distribution_of_components is None:
            if self.n_components % 3 != 0:
                raise ValueError("n_components must be divisible by 3")
            return [self.n_components // 3] * 3
        return list(self.distribution_of_components)

    def get_shapes(self, epoch: int) -> Dict[str, Tuple[int, ...]]:
        if self.basis_matrix is False and self.n_features != 1:
            raise ValueError(
                "Cannot set basis_matrix=False and n_features to != 1"
            )
        dist = self._distribution()
        width, height, depth = self.get_resolution(epoch)
        shape_dict = {
            "vector_components_x": (dist[1], width),
            "vector_components_y": (dist[2], height),
            "vector_components_z": (dist[0], depth),
            "matrix_components_xy": (dist[0], width, height),
            "matrix_components_yz": (dist[1], height, depth),
            "matrix_components_xz": (dist[2], width, depth),
        }
        if self.basis_matrix:
            shape_dict["basis_matrix"] = (sum(dist), self.n_features)
        return shape_dict

    def crop_local(self, min_point_local, max_point_local, grid_values):
        assert np.all(np.asarray(min_point_local) < np.asarray(max_point_local))
        width = grid_values["vector_components_x"].shape[-1]
        height = grid_values["vector_components_y"].shape[-1]
        depth = grid_values["vector_components_z"].shape[-1]
        (minx, miny, minz), (maxx, maxy, maxz) = self._crop_indices(
            min_point_local, max_point_local, (width, height, depth)
        )
        out = {
            "vector_components_x": grid_values["vector_components_x"][
                :, :, minx : maxx + 1
            ],
            "vector_components_y": grid_values["vector_components_y"][
                :, :, miny : maxy + 1
            ],
            "vector_components_z": grid_values["vector_components_z"][
                :, :, minz : maxz + 1
            ],
            "matrix_components_xy": grid_values["matrix_components_xy"][
                :, :, minx : maxx + 1, miny : maxy + 1
            ],
            "matrix_components_yz": grid_values["matrix_components_yz"][
                :, :, miny : maxy + 1, minz : maxz + 1
            ],
            "matrix_components_xz": grid_values["matrix_components_xz"][
                :, :, minx : maxx + 1, minz : maxz + 1
            ],
        }
        if grid_values.get("basis_matrix") is not None:
            out["basis_matrix"] = grid_values["basis_matrix"]
        return out


# --------------------------------------------------------------------------- #
# World <-> local mapping (the reference routes this through a (2,2,2)
# VolumeLocator, voxel_grid.py:1051; algebraically it is the affine map
# below, which we keep explicit and jit-friendly).
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class _GridLocator:
    """x_world = x_local * extents / 2 + translation, i.e. ``translation``
    is the world-space center of the grid (reference voxel_grid.py:1051
    routes this through a (2,2,2) VolumeLocator with
    volume_translation=-translation; structures/volumes.py:779-789 gives
    x_world = x_local * 0.5 * voxel_size - volume_translation)."""

    extents: Tuple[float, float, float]
    translation: Tuple[float, float, float]

    def world_to_local_coords(self, points: jnp.ndarray) -> jnp.ndarray:
        ext = jnp.asarray(self.extents, dtype=points.dtype)
        tr = jnp.asarray(self.translation, dtype=points.dtype)
        return (points - tr) * (2.0 / ext)

    def local_to_world_coords(self, points: jnp.ndarray) -> jnp.ndarray:
        ext = jnp.asarray(self.extents, dtype=points.dtype)
        tr = jnp.asarray(self.translation, dtype=points.dtype)
        return points * (ext / 2.0) + tr


# --------------------------------------------------------------------------- #
# VoxelGridModule: flax wrapper owning the values as parameters.
# --------------------------------------------------------------------------- #


class VoxelGridModule(nn.Module):
    """Flax wrapper for the voxel grids (reference voxel_grid.py:808).

    Parameters are created with the epoch-0 shapes; at apply time the
    *actual* parameter shapes rule, so resolution changes are applied by
    transforming the parameter pytree between steps (see
    ``apply_resolution_change`` / ``crop_module``) — flax does not
    re-validate shapes on apply, and XLA re-jits on the new shapes.

    ``extents``/``translation`` place the grid in world space:
    x_world = x_local * extents/2 - translation.
    """

    voxel_grid_class_type: str = "FullResolutionVoxelGrid"
    voxel_grid_args: Optional[Dict[str, Any]] = None
    extents: Tuple[float, float, float] = (2.0, 2.0, 2.0)
    translation: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    init_std: float = 0.1
    init_mean: float = 0.0
    hold_voxel_grid_as_parameters: bool = True
    param_groups: Optional[Dict[str, str]] = None

    @property
    def voxel_grid(self) -> VoxelGridBase:
        cls = registry.get(VoxelGridBase, self.voxel_grid_class_type)
        return cls(**(self.voxel_grid_args or {}))

    def _make_values(self) -> VoxelGridValues:
        grid = self.voxel_grid
        shapes = grid.get_shapes(epoch=0)

        values = {}
        for name, shape in shapes.items():
            if self.hold_voxel_grid_as_parameters:
                # self.variable("params", ...) rather than self.param:
                # flax re-checks param shapes against the initializer on
                # every apply, which would reject resolution-changed /
                # cropped grids (the whole point of this module).
                values[name] = self.variable(
                    "params",
                    name,
                    lambda s=shape: self.init_mean
                    + self.init_std
                    * jax.random.normal(
                        self.make_rng("params"), (1, *s), jnp.float32
                    ),
                ).value
            else:
                # non-trainable: lives in the 'buffers' collection
                # (reference _RegistratedBufferDict, voxel_grid.py:1117)
                values[name] = self.variable(
                    "buffers",
                    name,
                    lambda s=shape: self.init_mean
                    + self.init_std
                    * jax.random.normal(
                        jax.random.PRNGKey(0), (1, *s), jnp.float32
                    ),
                ).value
        return values

    def _placement(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """extents/translation live in the 'buffers' collection so that
        cropping (which moves the grid in world space) is a pure
        transform of the variables pytree — the static fields only seed
        them (the reference mutates module attributes instead,
        voxel_grid.py:1047-1049)."""
        ext = self.variable(
            "buffers",
            "extents",
            lambda: jnp.asarray(self.extents, jnp.float32),
        ).value
        tr = self.variable(
            "buffers",
            "translation",
            lambda: jnp.asarray(self.translation, jnp.float32),
        ).value
        return ext, tr

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        """Evaluate world-space points (..., 3) -> (..., n_features)."""
        values = self._make_values()
        ext, tr = self._placement()
        points_local = (points - tr) * (2.0 / ext)
        return self.voxel_grid.evaluate_local(points_local[None], values)[0]

    @staticmethod
    def get_output_dim(args: Dict[str, Any]) -> int:
        grid_cls = registry.get(
            VoxelGridBase,
            args.get("voxel_grid_class_type", "FullResolutionVoxelGrid"),
        )
        grid_args = {"n_features": 1, **(args.get("voxel_grid_args") or {})}
        return grid_cls.get_output_dim(grid_args)

    # -- epoch subscription (functional) ----------------------------------- #

    def get_resolution_change_epochs(self) -> Tuple[int, ...]:
        return self.voxel_grid.get_resolution_change_epochs()

    def get_grid_points(
        self,
        epoch: int,
        extents: Optional[jnp.ndarray] = None,
        translation: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """World-space voxel-center grid at `epoch`, shape (W, H, D, 3)
        (reference :1078; the reference's align_corners correction reuses
        xresolution for all axes — we apply each axis's own resolution).
        `extents`/`translation` default to the static fields; pass the
        'buffers' values after cropping."""
        xres, yres, zres = self.voxel_grid.get_resolution(epoch)
        ext = np.asarray(
            self.extents if extents is None else extents, np.float64
        )
        width, height, depth = ext
        if not self.voxel_grid.get_align_corners():
            width = width * (xres - 1) / xres if xres > 1 else width
            height = height * (yres - 1) / yres if yres > 1 else height
            depth = depth * (zres - 1) / zres if zres > 1 else depth
        xs = jnp.linspace(-width / 2, width / 2, xres)
        ys = jnp.linspace(-height / 2, height / 2, yres)
        zs = jnp.linspace(-depth / 2, depth / 2, zres)
        xm, ym, zm = jnp.meshgrid(xs, ys, zs, indexing="ij")
        grid = jnp.stack([xm, ym, zm], axis=3)
        # Voxel centers in world space: the grid's world center is
        # `translation` (the reference omits this shift, which is only
        # correct for translation=0; we include it).
        tr = jnp.asarray(
            self.translation if translation is None else translation,
            grid.dtype,
        )
        return grid + tr


def apply_resolution_change(
    module: VoxelGridModule,
    params: Dict[str, jnp.ndarray],
    epoch: int,
    **interp_kwargs,
) -> Tuple[Dict[str, jnp.ndarray], bool]:
    """Functional analog of the reference `VoxelGridModule._apply_epochs`
    (voxel_grid.py:939): resample this module's parameter dict to the
    epoch's resolution. Returns (new params subtree, changed?)."""
    new_values, changed = module.voxel_grid.change_resolution(
        params, epoch=epoch, **interp_kwargs
    )
    return (new_values if changed else params), changed


def crop_values(
    module: VoxelGridModule,
    params: Dict[str, jnp.ndarray],
    buffers: Dict[str, jnp.ndarray],
    min_point: jnp.ndarray,
    max_point: jnp.ndarray,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Functional analog of `VoxelGridModule.crop_self` (reference :1016):
    crops the grid to the [min_point, max_point] world box, resamples
    back to the original resolution, and updates the extents/translation
    buffers to describe the new box. Host-side (epoch boundary).

    Args:
        params: this module's parameter subtree (the grid values).
        buffers: this module's 'buffers' subtree (extents/translation).
    Returns:
        (new params subtree, new buffers subtree).
    """
    grid = module.voxel_grid
    ext = tuple(np.asarray(buffers["extents"], np.float64).tolist())
    tr = tuple(np.asarray(buffers["translation"], np.float64).tolist())
    locator = _GridLocator(ext, tr)
    cropped = grid.crop_world(
        jnp.asarray(min_point), jnp.asarray(max_point), params, locator
    )
    new_values, _ = grid.change_resolution(
        cropped, grid_values_with_wanted_resolution=params
    )
    mn = np.asarray(min_point, np.float64)
    mx = np.asarray(max_point, np.float64)
    new_buffers = dict(
        buffers,
        extents=jnp.asarray(mx - mn, jnp.float32),
        translation=jnp.asarray((mx + mn) / 2, jnp.float32),
    )
    return new_values, new_buffers
