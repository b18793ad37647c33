"""RadianceFieldRenderer: the full coarse+fine NeRF pipeline as one flax
module.

Parity: reference projects/nerf/nerf/nerf_renderer.py:22.

TPU design: one module owns a coarse and a fine `NeuralRadianceField`; at
train time a Monte-Carlo ray batch runs both passes (all static shapes, one
jit); at eval the full image grid is rendered in chunks.  PRNG keys are
threaded explicitly.  Sharding: rays are the data-parallel axis (see
pytorch3d_tpu/parallel) — the reference's `chunk_size_test` serial loop
becomes a sharded dimension on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .implicit_function import NeuralRadianceField
from .raymarcher import EmissionAbsorptionNeRFRaymarcher
from .raysampler import NeRFRaysampler, ProbabilisticRaysampler
from .utils import calc_mse, calc_psnr, sample_images_at_mc_locs


class RadianceFieldRenderer(nn.Module):
    image_width: int
    image_height: int
    n_pts_per_ray: int = 64
    n_pts_per_ray_fine: int = 64
    # jax.checkpoint the field MLPs: recompute activations in the
    # backward pass instead of holding them in HBM (trade FLOPs for
    # memory at large ray batches)
    remat: bool = False
    n_rays_per_image: int = 1024
    min_depth: float = 0.1
    max_depth: float = 100.0
    stratified: bool = True
    stratified_test: bool = False
    density_noise_std: float = 0.0
    n_harmonic_functions_xyz: int = 6
    n_harmonic_functions_dir: int = 4
    n_hidden_neurons_xyz: int = 256
    n_hidden_neurons_dir: int = 128
    n_layers_xyz: int = 8
    append_xyz: tuple = (5,)
    bg_color: tuple = (0.0, 0.0, 0.0)  # composited where rays are empty
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        field_cls = (
            nn.remat(NeuralRadianceField) if self.remat else NeuralRadianceField
        )
        self._renderer_coarse_field = field_cls(
            n_harmonic_functions_xyz=self.n_harmonic_functions_xyz,
            n_harmonic_functions_dir=self.n_harmonic_functions_dir,
            n_hidden_neurons_xyz=self.n_hidden_neurons_xyz,
            n_hidden_neurons_dir=self.n_hidden_neurons_dir,
            n_layers_xyz=self.n_layers_xyz,
            append_xyz=self.append_xyz,
            dtype=self.dtype,
        )
        self._renderer_fine_field = field_cls(
            n_harmonic_functions_xyz=self.n_harmonic_functions_xyz,
            n_harmonic_functions_dir=self.n_harmonic_functions_dir,
            n_hidden_neurons_xyz=self.n_hidden_neurons_xyz,
            n_hidden_neurons_dir=self.n_hidden_neurons_dir,
            n_layers_xyz=self.n_layers_xyz,
            append_xyz=self.append_xyz,
            dtype=self.dtype,
        )
        self._raymarcher = EmissionAbsorptionNeRFRaymarcher()
        self._raysampler = NeRFRaysampler(
            n_pts_per_ray=self.n_pts_per_ray,
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            n_rays_per_image=self.n_rays_per_image,
            image_width=self.image_width,
            image_height=self.image_height,
            stratified=self.stratified,
            stratified_test=self.stratified_test,
        )
        self._raysampler_fine = ProbabilisticRaysampler(
            n_pts_per_ray=self.n_pts_per_ray_fine,
            stratified=self.stratified,
            stratified_test=self.stratified_test,
        )

    def __call__(
        self,
        cameras,
        image: Optional[jnp.ndarray] = None,  # (B, H, W, 3)
        training: bool = True,
        key: Optional[jax.Array] = None,
        chunksize: Optional[int] = None,
        chunk_idx: int = 0,
        ray_sharding=None,
    ):
        """Render rays (MC at train, grid chunk at eval).

        Returns (out, metrics): out has rgb_coarse / rgb_fine / rgb_gt,
        metrics has mse/psnr for both passes (when `image` given).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        k_rays, k_coarse, k_fine = jax.random.split(key, 3)

        ray_bundle = self._raysampler(
            cameras,
            chunksize=chunksize,
            chunk_idx=chunk_idx,
            key=k_rays,
            training=training,
        )
        if ray_sharding is not None:
            # Pin the (B, R, ...) ray tensors to the ("dp", "rays") mesh axes
            # so the MLP evaluation shards over rays (the TPU-native version
            # of the reference's serial ray chunking).
            ray_bundle = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, ray_sharding),
                ray_bundle,
            )

        # coarse pass
        densities, colors = self._renderer_coarse_field(
            ray_bundle, density_noise_std=self.density_noise_std,
            noise_key=k_coarse if self.density_noise_std > 0 else None,
        )
        rgb_coarse, weights = self._raymarcher(densities, colors)
        bg = jnp.asarray(self.bg_color, rgb_coarse.dtype)
        rgb_coarse = rgb_coarse + (
            1.0 - jnp.sum(weights, axis=-1, keepdims=True)
        ) * bg

        # fine pass (importance resampling)
        ray_bundle_fine = self._raysampler_fine(
            ray_bundle, jax.lax.stop_gradient(weights),
            training=training, key=k_fine,
        )
        k_fine, k_noise_f = jax.random.split(k_fine)
        densities_f, colors_f = self._renderer_fine_field(
            ray_bundle_fine, density_noise_std=self.density_noise_std,
            noise_key=k_noise_f if self.density_noise_std > 0 else None,
        )
        rgb_fine, weights_f = self._raymarcher(densities_f, colors_f)
        rgb_fine = rgb_fine + (
            1.0 - jnp.sum(weights_f, axis=-1, keepdims=True)
        ) * bg

        out = {"rgb_coarse": rgb_coarse, "rgb_fine": rgb_fine}
        metrics = {}
        if image is not None:
            rgb_gt = sample_images_at_mc_locs(image, ray_bundle.xys)
            out["rgb_gt"] = rgb_gt
            metrics = {
                "mse_coarse": calc_mse(rgb_coarse, rgb_gt),
                "mse_fine": calc_mse(rgb_fine, rgb_gt),
                "psnr_coarse": calc_psnr(rgb_coarse, rgb_gt),
                "psnr_fine": calc_psnr(rgb_fine, rgb_gt),
            }
        return out, metrics
