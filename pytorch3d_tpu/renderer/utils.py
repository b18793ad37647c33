"""Renderer utility classes and functions.

Parity: reference renderer/utils.py (`TensorProperties` :97,
`ndc_grid_sample` :359, `ndc_to_grid_sample_coords` :413).

Our camera/light/material classes are flax struct dataclasses (immutable
pytrees) rather than the reference's mutable TensorProperties; the
`TensorProperties` shim below provides the same broadcasting constructor
for user code that subclasses it directly.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample


class TensorProperties:
    """Minimal batched-attribute base (reference renderer/utils.py:97).

    Keyword tensor attributes are broadcast to a common batch dim N.
    """

    def __init__(self, dtype=jnp.float32, device=None, **kwargs) -> None:
        self.device = device
        args_to_broadcast = {
            k: v for k, v in kwargs.items()
            if v is not None and isinstance(v, (float, int, list, tuple, np.ndarray, jnp.ndarray))
        }
        names = list(args_to_broadcast.keys())
        values = [
            jnp.atleast_1d(jnp.asarray(v, dtype))
            if not isinstance(v, jnp.ndarray)
            else v
            for v in args_to_broadcast.values()
        ]
        sizes = [v.shape[0] if v.ndim > 0 else 1 for v in values]
        N = max(sizes) if sizes else 0
        self._N = N
        for k, v in zip(names, values):
            if v.ndim == 0:
                v = v[None]
            if v.shape[0] == 1 and N > 1:
                v = jnp.broadcast_to(v, (N,) + v.shape[1:])
            elif v.shape[0] not in (N, 1):
                raise ValueError(f"Tensor {k} has incompatible batch dim")
            setattr(self, k, v)
        for k, v in kwargs.items():
            if k not in args_to_broadcast:
                setattr(self, k, v)

    def __len__(self) -> int:
        return self._N

    def __getitem__(self, index):
        """Indexed shallow copy over the batch dim (reference :153's
        TensorAccessor, returned as a new instance rather than a view —
        jax arrays are immutable so write-through cannot be supported)."""
        import copy

        if isinstance(index, int):
            # jnp indexing clamps silently; match the reference's strict
            # bounds check (TensorAccessor raises on a bad batch index)
            if not -self._N <= index < self._N:
                raise IndexError(
                    f"index {index} out of range for batch size {self._N}"
                )
            if index < 0:
                index += self._N
            index = slice(index, index + 1)
        out = copy.copy(self)
        n = None
        for k, v in vars(self).items():
            if (
                isinstance(v, jnp.ndarray)
                and v.ndim > 0
                and v.shape[0] == self._N
            ):
                setattr(out, k, v[index])
                n = out.__dict__[k].shape[0]
        if n is not None:
            out._N = n
        return out

    def isempty(self) -> bool:
        return self._N == 0

    def to(self, device=None):
        return self

    def clone(self, other=None):
        import copy

        return copy.deepcopy(self)

    def gather_props(self, batch_idx):
        n = self._N
        for k, v in vars(self).items():
            if isinstance(v, jnp.ndarray) and v.ndim > 0 and v.shape[0] == self._N:
                setattr(self, k, v[batch_idx])
                n = self.__dict__[k].shape[0]
        self._N = n
        return self


def format_tensor(input, dtype=None, device=None):
    """Convert a python scalar / sequence to an array with at least one
    dimension (reference renderer/utils.py:284; the device argument is
    accepted for API parity — placement is explicit in JAX)."""
    import jax.numpy as jnp

    x = jnp.asarray(input, dtype or jnp.float32)
    if x.ndim == 0:
        x = x.reshape(1)
    return x


def convert_to_tensors_and_broadcast(*args, dtype=None, device=None):
    """Convert the inputs to arrays and broadcast their leading (batch)
    dimension (reference renderer/utils.py:317)."""
    import jax.numpy as jnp

    tensors = [format_tensor(a, dtype=dtype) for a in args]
    sizes = [t.shape[0] for t in tensors]
    N = max(sizes)
    if not all(s in (1, N) for s in sizes):
        raise ValueError(f"Got non-broadcastable sizes {sizes}")
    return [
        jnp.broadcast_to(t, (N,) + t.shape[1:]) if t.shape[0] == 1 else t
        for t in tensors
    ]


def parse_image_size(image_size) -> "tuple":
    """Normalize an image-size argument to (H, W) (reference
    renderer/utils.py:441)."""
    if not isinstance(image_size, (tuple, list)):
        return (image_size, image_size)
    if len(image_size) != 2:
        raise ValueError("Image size can only be a tuple/list of (H, W)")
    if not all(i > 0 for i in image_size):
        raise ValueError(
            "Image sizes must be greater than 0; got %d, %d" % tuple(image_size)
        )
    if not all(isinstance(i, int) for i in image_size):
        raise ValueError(
            "Image sizes must be integers; got %f, %f" % tuple(image_size)
        )
    return tuple(image_size)


def ndc_to_grid_sample_coords(
    xy_ndc: jnp.ndarray, image_size_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Convert +X-left/+Y-up NDC coords to grid_sample's +x-right/+y-down
    [-1, 1] coords, accounting for non-square aspect (reference :413)."""
    H, W = image_size_hw
    aspect = min(H, W)
    xy = -xy_ndc * jnp.asarray(
        [aspect / W, aspect / H], xy_ndc.dtype
    )
    return xy


def ndc_grid_sample(
    input: jnp.ndarray,  # (N, C, H, W)
    grid_ndc: jnp.ndarray,  # (N, ..., 2) NDC coords
    mode: str = "bilinear",
    align_corners: bool = False,
    **kwargs,
) -> jnp.ndarray:
    """grid_sample at PyTorch3D-NDC locations (reference :359)."""
    N, C, H, W = input.shape
    spatial = grid_ndc.shape[1:-1]
    grid = ndc_to_grid_sample_coords(
        grid_ndc.reshape(N, -1, 2), (H, W)
    )[:, None]  # (N, 1, P, 2)
    out = grid_sample(
        input, grid, mode=mode, align_corners=align_corners,
        padding_mode=kwargs.get("padding_mode", "zeros"),
    )  # (N, C, 1, P)
    return out[:, :, 0].reshape((N, C) + spatial)


def ndc_grid_sample_packed(
    input: jnp.ndarray,  # (N, C, H, W)
    xys_ndc: jnp.ndarray,  # (R, 2) NDC coords, one per packed ray
    camera_ids: jnp.ndarray,  # (R,) int, image index per ray
    mode: str = "bilinear",
) -> jnp.ndarray:
    """`ndc_grid_sample` for a packed (heterogeneous) ray bundle.

    Static-shape replacement for the reference's pad-then-sample path
    (reference implicitron/models/metrics.py:254-281): instead of
    re-padding rays per unique camera (dynamic shapes), gather the four
    bilinear neighbour pixels of each ray directly from its source image
    — O(R*4*C) memory with no image replication.  Matches
    `ndc_grid_sample(..., align_corners=False, padding_mode="zeros")`.

    Returns (R, C).
    """
    N, C, H, W = input.shape
    grid = ndc_to_grid_sample_coords(xys_ndc, (H, W))  # (R, 2) in [-1, 1]
    # align_corners=False pixel-center mapping (torch grid_sample)
    px = ((grid[:, 0] + 1.0) * W - 1.0) * 0.5
    py = ((grid[:, 1] + 1.0) * H - 1.0) * 0.5

    def fetch(ix, iy):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        v = input[
            camera_ids, :, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)
        ]  # (R, C)
        return jnp.where(valid[:, None], v, 0.0)

    if mode == "nearest":
        return fetch(
            jnp.round(px).astype(jnp.int32), jnp.round(py).astype(jnp.int32)
        )
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    wx = (px - x0)[:, None]
    wy = (py - y0)[:, None]
    return (
        fetch(x0, y0) * (1 - wx) * (1 - wy)
        + fetch(x0 + 1, y0) * wx * (1 - wy)
        + fetch(x0, y0 + 1) * (1 - wx) * wy
        + fetch(x0 + 1, y0 + 1) * wx * wy
    )


class TensorAccessor:
    """Accessor for one batch element of a TensorProperties object
    (reference renderer/utils.py:27). JAX arrays are immutable, so
    attribute WRITES create new arrays on the owner via .at[].set."""

    def __init__(self, class_object, index) -> None:
        self.__dict__["class_object"] = class_object
        self.__dict__["index"] = index

    def __getattr__(self, name: str):
        full = getattr(self.__dict__["class_object"], name)
        if isinstance(full, jnp.ndarray) and full.ndim > 0:
            return full[self.__dict__["index"]]
        return full

    def __setattr__(self, name: str, value) -> None:
        obj = self.__dict__["class_object"]
        full = getattr(obj, name, None)
        if isinstance(full, jnp.ndarray) and full.ndim > 0:
            setattr(
                obj, name, full.at[self.__dict__["index"]].set(value)
            )
        else:
            setattr(obj, name, value)
