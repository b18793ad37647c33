"""Voxel-grid implicit function (DVGO/TensoRF style), full surface.

Parity: reference
implicitron/models/implicit_function/voxel_grid_implicit_function.py:40
(`VoxelGridImplicitFunction`): two streams (density / color), each
voxel grid -> harmonic embedding -> decoding function; a low-resolution
binary "scaffold" grid that marks empty space (TensoRF's AlphaMask),
used to zero out empty-space points and to find the object bounding box
for volume cropping at scheduled epochs.

TPU-first deviations (all behavior-preserving):
- The reference gathers the non-empty points into a ragged tensor
  (`:265`) — dynamic shapes. We evaluate all points and multiply by the
  scaffold mask instead: identical outputs, static shapes, and the
  masked points' grid reads are tiny gathers anyway.
- Epoch-scheduled updates (scaffold calculation, cropping, resolution
  change) are pure transforms of the flax variables pytree, applied
  between jitted steps (`apply_epoch`); the reference mutates module
  state in-place.
- `use_multiple_streams` (CUDA streams, reference :335) has no TPU
  analog: XLA already schedules the two independent streams' ops
  concurrently from one graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ....common.math_utils import safe_norm
from ....renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ....renderer.implicit.utils import ray_bundle_to_ray_points
from ...tools.config import registry
from .base import ImplicitFunctionBase
from .decoding_functions import DecoderFunctionBase, MLPDecoder  # noqa: F401
from .voxel_grid import (
    VoxelGridModule,
    apply_resolution_change,
    crop_values,
)

_GRID_CLASS_FOR_LEGACY_TYPE = {
    "full": "FullResolutionVoxelGrid",
    "cp": "CPFactorizedVoxelGrid",
    "vm": "VMFactorizedVoxelGrid",
}


@registry.register
class VoxelGridImplicitFunction(nn.Module, ImplicitFunctionBase):
    """Density/color voxel-grid implicit function (reference :40).

    Density: voxel_grid_density -> harmonic_embedder_xyz_density ->
    decoder_density [-> density_activation].
    Color: voxel_grid_color -> harmonic_embedder_xyz_color, concat with
    harmonic_embedder_dir_color(normalized directions) -> decoder_color.

    The legacy convenience fields (grid_type / resolution / n_components
    / ...) from round 1 are kept and expand into the full surface when
    the corresponding `*_args` dict is not given; `density_activation`
    defaults to the DVGO-style `1 - exp(-softplus(x))` capping the
    legacy class used (set it to "identity" for the reference's
    raw-density contract, where the raymarcher does the capping).
    """

    # ---- full reference surface
    voxel_grid_density_args: Optional[Dict[str, Any]] = None
    voxel_grid_color_args: Optional[Dict[str, Any]] = None
    harmonic_embedder_xyz_density_args: Optional[Dict[str, Any]] = None
    harmonic_embedder_xyz_color_args: Optional[Dict[str, Any]] = None
    harmonic_embedder_dir_color_args: Optional[Dict[str, Any]] = None
    # reference default is MLPDecoder for both; our default keeps the
    # legacy round-1 behavior (raw grid feature -> activation for
    # density, 2-layer sigmoid MLP for color)
    decoder_density_class_type: str = "ElementwiseDecoder"
    decoder_density_args: Optional[Dict[str, Any]] = None
    decoder_color_class_type: str = "MLPDecoder"
    decoder_color_args: Optional[Dict[str, Any]] = None
    xyz_ray_dir_in_camera_coords: bool = False
    # ---- scaffold (reference :179-186)
    scaffold_calculating_epochs: Tuple[int, ...] = ()
    scaffold_resolution: Tuple[int, int, int] = (128, 128, 128)
    scaffold_empty_space_threshold: float = 0.001
    scaffold_max_pool_kernel_size: int = 3
    scaffold_filter_points: bool = True
    volume_cropping_epochs: Tuple[int, ...] = ()
    # ---- legacy convenience surface (round-1 API)
    grid_type: str = "vm"
    resolution: Tuple[int, int, int] = (64, 64, 64)
    n_components: int = 24
    n_features_density: int = 1
    n_features_color: int = 27
    n_hidden_color: int = 64
    n_harmonic_functions_dir: int = 2
    scene_extent: float = 2.0
    density_activation: str = "one_minus_exp_softplus"

    # ------------------------------------------------------------------ #
    # configuration expansion
    # ------------------------------------------------------------------ #

    def _legacy_grid_args(self, n_features: int) -> Dict[str, Any]:
        grid_args: Dict[str, Any] = {
            "n_features": n_features,
            "resolution_changes": {0: list(self.resolution)},
        }
        if self.grid_type in ("cp", "vm"):
            grid_args["n_components"] = self.n_components
        return {
            "voxel_grid_class_type": _GRID_CLASS_FOR_LEGACY_TYPE[
                self.grid_type
            ],
            "voxel_grid_args": grid_args,
            # legacy scaled points by 1/scene_extent into [-1, 1]
            "extents": (2.0 * self.scene_extent,) * 3,
            "translation": (0.0, 0.0, 0.0),
        }

    def _density_grid_args(self) -> Dict[str, Any]:
        return self.voxel_grid_density_args or self._legacy_grid_args(
            self.n_features_density
        )

    def _color_grid_args(self) -> Dict[str, Any]:
        return self.voxel_grid_color_args or self._legacy_grid_args(
            self.n_features_color
        )

    def _scaffold_grid_args(self) -> Dict[str, Any]:
        # extents/translation follow the density grid (reference :633)
        density = self._density_grid_args()
        return {
            "voxel_grid_class_type": "FullResolutionVoxelGrid",
            "voxel_grid_args": {
                "n_features": 1,
                "resolution_changes": {0: list(self.scaffold_resolution)},
                # occupancy is a step function: sample it without blending
                "mode": "nearest",
            },
            "extents": density.get("extents", (2.0, 2.0, 2.0)),
            "translation": density.get("translation", (0.0, 0.0, 0.0)),
            "hold_voxel_grid_as_parameters": False,
            "init_std": 0.0,
            "init_mean": 1.0,  # unknown space counts as occupied until computed
        }

    def setup(self):
        self.voxel_grid_density = VoxelGridModule(
            **self._density_grid_args(), name="voxel_grid_density"
        )
        self.voxel_grid_color = VoxelGridModule(
            **self._color_grid_args(), name="voxel_grid_color"
        )
        self.voxel_grid_scaffold = VoxelGridModule(
            **self._scaffold_grid_args(), name="voxel_grid_scaffold"
        )
        self.harmonic_embedder_xyz_density = HarmonicEmbedding(
            **(
                self.harmonic_embedder_xyz_density_args
                if self.harmonic_embedder_xyz_density_args is not None
                else {"n_harmonic_functions": 0, "append_input": True}
            )
        )
        self.harmonic_embedder_xyz_color = HarmonicEmbedding(
            **(
                self.harmonic_embedder_xyz_color_args
                if self.harmonic_embedder_xyz_color_args is not None
                else {"n_harmonic_functions": 0, "append_input": True}
            )
        )
        self.harmonic_embedder_dir_color = HarmonicEmbedding(
            **(
                self.harmonic_embedder_dir_color_args
                if self.harmonic_embedder_dir_color_args is not None
                else {
                    "n_harmonic_functions": self.n_harmonic_functions_dir,
                    "append_input": True,
                }
            )
        )
        cls_d, args_d = self._decoder_spec("density")
        self.decoder_density = cls_d(**args_d, name="decoder_density")
        cls_c, args_c = self._decoder_spec("color")
        self.decoder_color = cls_c(**args_c, name="decoder_color")
        self._scaffold_ready = self.variable(
            "buffers", "scaffold_ready", lambda: jnp.zeros((), jnp.float32)
        )

    def _decoder_spec(self, which: str):
        """(class, ctor args) for the density/color decoder; defaults
        reproduce the legacy round-1 heads."""
        class_type = getattr(self, f"decoder_{which}_class_type")
        args = getattr(self, f"decoder_{which}_args")
        cls = registry.get(DecoderFunctionBase, class_type)
        if args is None:
            if which == "color" and class_type == "MLPDecoder":
                # legacy TensoRF color head: Dense(H) relu Dense(3) sigmoid
                args = {
                    "network_args": {
                        "n_layers": 2,
                        "hidden_dim": self.n_hidden_color,
                        "output_dim": 3,
                        "input_skips": (),
                        "last_activation": "sigmoid",
                        "last_layer_bias_init": 0.0,
                        "use_xavier_init": False,
                    }
                }
            else:
                args = {}
        return cls, args

    # ------------------------------------------------------------------ #
    # evaluation
    # ------------------------------------------------------------------ #

    def _apply_density_activation(self, raw: jnp.ndarray) -> jnp.ndarray:
        if self.density_activation == "one_minus_exp_softplus":
            return 1.0 - jnp.exp(-nn.softplus(raw))
        if self.density_activation == "softplus":
            return nn.softplus(raw)
        if self.density_activation == "relu":
            return nn.relu(raw)
        return raw  # "identity": reference contract

    def _get_density(self, points: jnp.ndarray) -> jnp.ndarray:
        """grid -> harmonic -> decoder (reference :360). Returns the
        decoder output with `density_activation` applied."""
        embeds = self.voxel_grid_density(points)
        harmonics = self.harmonic_embedder_xyz_density(embeds)
        return self._apply_density_activation(self.decoder_density(harmonics))

    def _get_color(
        self,
        points: jnp.ndarray,  # (..., S, 3)
        directions: jnp.ndarray,  # (..., 3) one per ray
        camera=None,
    ) -> jnp.ndarray:
        """grid -> harmonic, concat harmonic(normalized dir) -> decoder
        (reference :380)."""
        if self.xyz_ray_dir_in_camera_coords:
            if camera is None:
                raise ValueError(
                    "Camera must be given if xyz_ray_dir_in_camera_coords"
                )
            directions = directions @ camera.R
        embeds = self.voxel_grid_color(points)
        harmonics_color = self.harmonic_embedder_xyz_color(embeds)
        d = directions / jnp.clip(safe_norm(directions, axis=-1, keepdims=True), 1e-12)
        harmonics_dir = self.harmonic_embedder_dir_color(d)
        # one direction per ray, broadcast over the points-per-ray axis
        harmonics_dir = jnp.broadcast_to(
            harmonics_dir[..., None, :],
            points.shape[:-1] + (harmonics_dir.shape[-1],),
        )
        total = jnp.concatenate([harmonics_color, harmonics_dir], axis=-1)
        return self.decoder_color(total)

    def _scaffold_mask(self, points: jnp.ndarray) -> jnp.ndarray:
        """(..., 1) mask: 1 where the scaffold marks occupied space (or
        the scaffold has not been computed yet), 0 in empty space."""
        ready = self._scaffold_ready.value
        occ = self.voxel_grid_scaffold(points) > 0.0
        return jnp.where(ready > 0, occ.astype(jnp.float32), 1.0)

    def __call__(
        self,
        ray_bundle,
        fun_viewpool=None,
        camera=None,
        global_code=None,
        density_noise_std: float = 0.0,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(..., S, 1) densities and (..., S, 3) colors at ray points
        (reference :215). Scaffold-filtered points contribute 0 density
        and (0, 0, 0) color via masking (static shapes on TPU)."""
        points = ray_bundle_to_ray_points(ray_bundle)  # (..., S, 3)
        directions = ray_bundle.directions

        densities = self._get_density(points)
        colors = self._get_color(points, directions, camera)

        if self.scaffold_filter_points:
            mask = self._scaffold_mask(points)
            densities = densities * mask
            colors = colors * mask
        return densities, colors

    @staticmethod
    def allows_multiple_passes() -> bool:
        return True

    # ------------------------------------------------------------------ #
    # epoch-scheduled updates (scaffold / cropping / resolution changes)
    # ------------------------------------------------------------------ #

    def subscribe_to_epochs(self) -> Tuple[int, ...]:
        """Epochs at which `apply_epoch` must be called (reference :455
        returns (epochs, callback); functionally the callback is
        `apply_epoch`)."""
        epochs = set(self.scaffold_calculating_epochs) | set(
            self.volume_cropping_epochs
        )
        for args in (self._density_grid_args(), self._color_grid_args()):
            changes = (args.get("voxel_grid_args") or {}).get(
                "resolution_changes", {0: None}
            )
            epochs |= {e for e in changes.keys() if e != 0}
        return tuple(sorted(epochs))

    def apply_epoch(
        self, variables: Dict[str, Any], epoch: int
    ) -> Tuple[Dict[str, Any], bool]:
        """Runs the epoch-scheduled updates on this function's variables
        subtree ({'params': ..., 'buffers': ...}). Returns the updated
        variables and whether trainable parameter shapes changed (the
        trainer must then rebuild optimizer state). Host-side."""
        params = dict(variables.get("params", {}))
        buffers = {
            k: dict(v) if isinstance(v, dict) else v
            for k, v in variables.get("buffers", {}).items()
        }
        changed = False

        # -- grid resolution changes (reference VoxelGridModule:939)
        for name, module in (
            ("voxel_grid_density", self.voxel_grid_density_module()),
            ("voxel_grid_color", self.voxel_grid_color_module()),
        ):
            if name in params:
                new_values, ch = apply_resolution_change(
                    module, params[name], epoch
                )
                if ch:
                    params[name] = new_values
                    changed = True

        # -- scaffold recomputation (reference :520)
        if epoch in self.scaffold_calculating_epochs:
            buffers = self._compute_scaffold(params, buffers)

        # -- volume cropping (reference :482)
        if epoch in self.volume_cropping_epochs:
            box = self._scaffold_bounding_box(buffers)
            if box is not None:
                mn, mx = box
                for name, module in (
                    ("voxel_grid_density", self.voxel_grid_density_module()),
                    ("voxel_grid_color", self.voxel_grid_color_module()),
                ):
                    new_params, new_buf = crop_values(
                        module,
                        params[name],
                        buffers.get(name, {}),
                        mn,
                        mx,
                    )
                    params[name] = new_params
                    buffers[name] = new_buf
                changed = True

        out = dict(variables)
        out["params"] = params
        out["buffers"] = buffers
        return out, changed

    # standalone module constructors (parent=None keeps flax from
    # registering them as children when called from module methods)
    def voxel_grid_density_module(self) -> VoxelGridModule:
        return VoxelGridModule(**self._density_grid_args(), parent=None)

    def voxel_grid_color_module(self) -> VoxelGridModule:
        return VoxelGridModule(**self._color_grid_args(), parent=None)

    def voxel_grid_scaffold_module(self) -> VoxelGridModule:
        return VoxelGridModule(**self._scaffold_grid_args(), parent=None)

    def _compute_scaffold(
        self, params: Dict[str, Any], buffers: Dict[str, Any]
    ) -> Dict[str, Any]:
        """Evaluate density on the scaffold grid, 3D max-pool, threshold
        (reference :520-557). Returns updated buffers."""
        scaffold = self.voxel_grid_scaffold_module()
        sc_buf = buffers.get("voxel_grid_scaffold", {})
        points = scaffold.get_grid_points(
            epoch=0,
            extents=sc_buf.get("extents"),
            translation=sc_buf.get("translation"),
        )  # (W, H, D, 3)

        density_module = self.voxel_grid_density_module()
        emb = HarmonicEmbedding(
            **(
                self.harmonic_embedder_xyz_density_args
                if self.harmonic_embedder_xyz_density_args is not None
                else {"n_harmonic_functions": 0, "append_input": True}
            )
        )

        def density_fn(pts):
            grid_vars = {
                "params": params["voxel_grid_density"],
                "buffers": buffers.get("voxel_grid_density", {}),
            }
            feats = density_module.apply(grid_vars, pts)
            h = emb(feats)
            cls_d, args_d = self._decoder_spec("density")
            dec = cls_d(**args_d, parent=None)
            dec_params = params.get("decoder_density")
            raw = dec.apply(
                {"params": dec_params} if dec_params is not None else {}, h
            )
            return self._apply_density_activation(raw)

        density_cube = density_fn(points)[..., 0]  # (W, H, D)

        k = self.scaffold_max_pool_kernel_size
        pad = k // 2
        pooled = jax.lax.reduce_window(
            density_cube,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(k, k, k),
            window_strides=(1, 1, 1),
            padding=[(pad, pad)] * 3,
        )
        occupancy = (pooled > self.scaffold_empty_space_threshold).astype(
            jnp.float32
        )

        new_buffers = dict(buffers)
        sc = dict(new_buffers.get("voxel_grid_scaffold", {}))
        sc["voxel_grid"] = occupancy[None, None]  # (G=1, C=1, W, H, D)
        new_buffers["voxel_grid_scaffold"] = sc
        new_buffers["scaffold_ready"] = jnp.ones((), jnp.float32)
        return new_buffers

    def _scaffold_bounding_box(
        self, buffers: Dict[str, Any]
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """World-space bounding box of the occupied scaffold voxels
        (reference :495-507), or None if empty / not computed."""
        ready = buffers.get("scaffold_ready")
        if ready is None or float(np.asarray(ready)) <= 0:
            return None
        sc_buf = buffers.get("voxel_grid_scaffold", {})
        occupancy = np.asarray(sc_buf["voxel_grid"])[0, 0]  # (W, H, D)
        idx = np.argwhere(occupancy > 0)
        if idx.size == 0:
            return None
        scaffold = self.voxel_grid_scaffold_module()
        points = np.asarray(
            scaffold.get_grid_points(
                epoch=0,
                extents=sc_buf.get("extents"),
                translation=sc_buf.get("translation"),
            )
        )
        mins = idx.min(axis=0)
        maxs = idx.max(axis=0)
        min_point = points[tuple(mins)]
        max_point = points[tuple(maxs)]
        return min_point, max_point
