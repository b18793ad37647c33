"""NeRF / NeRFormer implicit functions for Implicitron.

Parity: reference implicitron/models/implicit_function/neural_radiance_field.py
(`NeuralRadianceFieldBase` :35, `NeuralRadianceFieldImplicitFunction` :240,
`NeRFormerImplicitFunction` :259).

Flax modules; the hot path is the batched MLP over ray points (MXU GEMMs).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ....models.nerf.implicit_function import MLPWithInputSkips, _DenseParams
from ....renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ....renderer.implicit.utils import ray_bundle_to_ray_points
from ...tools.config import registry
from .base import ImplicitFunctionBase


class NeuralRadianceFieldBase(nn.Module, ImplicitFunctionBase):
    n_harmonic_functions_xyz: int = 10
    n_harmonic_functions_dir: int = 4
    n_hidden_neurons_xyz: int = 256
    n_hidden_neurons_dir: int = 128
    latent_dim: int = 0
    input_xyz: bool = True
    xyz_ray_dir_in_camera_coords: bool = False
    color_dim: int = 3
    n_layers_xyz: int = 8
    append_xyz: Tuple[int, ...] = (5,)
    use_transformer_trunk: bool = False
    transformer_dim_down_factor: float = 1.0

    def setup(self):
        self.harmonic_embedding_xyz = HarmonicEmbedding(
            self.n_harmonic_functions_xyz
        )
        self.harmonic_embedding_dir = HarmonicEmbedding(
            self.n_harmonic_functions_dir
        )
        if self.use_transformer_trunk:
            # NeRFormer: attention over ray points (reference :259 +
            # decoding_functions.py:302)
            from .decoding_functions import TransformerWithInputSkips

            self.xyz_encoder = TransformerWithInputSkips(
                n_layers=self.n_layers_xyz,
                output_dim=self.n_hidden_neurons_xyz,
                skip_dim=self.harmonic_embedding_xyz.get_output_dim(3),
                hidden_dim=self.n_hidden_neurons_xyz,
                input_skips=self.append_xyz,
                dim_down_factor=self.transformer_dim_down_factor,
            )
        else:
            self.xyz_encoder = MLPWithInputSkips(
                n_layers=self.n_layers_xyz,
                output_dim=self.n_hidden_neurons_xyz,
                skip_dim=self.harmonic_embedding_xyz.get_output_dim(3),
                hidden_dim=self.n_hidden_neurons_xyz,
                input_skips=self.append_xyz,
            )
        # raw (kernel, bias) holders (same names/param-trees as the
        # previous nn.Dense layout) so the fused-field Pallas path can
        # take the head weights by value; flax-default lecun init kept
        H = self.n_hidden_neurons_xyz
        d_dir = self.harmonic_embedding_dir.get_output_dim(3)
        lecun = nn.initializers.lecun_normal()
        self.intermediate_linear = _DenseParams(
            features=H, in_features=H, kernel_init=lecun
        )
        self.density_layer = _DenseParams(
            features=1, in_features=H, kernel_init=lecun
        )
        self.color_layer_hidden = _DenseParams(
            features=self.n_hidden_neurons_dir,
            in_features=H + d_dir,
            kernel_init=lecun,
        )
        self.color_layer_out = _DenseParams(
            features=self.color_dim,
            in_features=self.n_hidden_neurons_dir,
            kernel_init=lecun,
        )

    def _dense(self, dp, x):
        k, b = dp()
        return jnp.dot(x, k) + b

    def _head_params(self):
        wi, bi = self.intermediate_linear()
        wd, bd = self.density_layer()
        wc1, bc1 = self.color_layer_hidden()
        wc2, bc2 = self.color_layer_out()
        H = self.n_hidden_neurons_xyz
        return (wd, bd, wi, bi, wc1[:H], wc1[H:], bc1, wc2, bc2)

    def _dir_embed(self, spatial, directions):
        d = directions / jnp.clip(
            jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12
        )
        d_embed = self.harmonic_embedding_dir(d)
        return jnp.broadcast_to(
            d_embed[..., None, :], spatial + (d_embed.shape[-1],)
        )

    def _get_colors(self, features, directions):
        d_embed = self._dir_embed(features.shape[:-1], directions)
        inp = jnp.concatenate(
            [self._dense(self.intermediate_linear, features), d_embed],
            axis=-1,
        )
        return nn.sigmoid(
            self._dense(
                self.color_layer_out,
                nn.relu(self._dense(self.color_layer_hidden, inp)),
            )
        )

    @staticmethod
    def requires_pooling_without_aggregation() -> bool:
        return False

    def __call__(
        self,
        ray_bundle,
        fun_viewpool=None,
        camera=None,
        global_code=None,
        density_noise_std: float = 0.0,
        **kwargs,
    ):
        pts = ray_bundle_to_ray_points(ray_bundle)
        embeds = self.harmonic_embedding_xyz(pts)
        if global_code is not None:
            # (B, D) broadcast over the ray/point dims
            g = global_code.reshape(
                global_code.shape[:1]
                + (1,) * (embeds.ndim - 2)
                + global_code.shape[-1:]
            )
            g = jnp.broadcast_to(
                g, embeds.shape[:-1] + (global_code.shape[-1],)
            )
            embeds = jnp.concatenate([embeds, g], axis=-1)
        per_view = fun_viewpool is not None and getattr(
            fun_viewpool, "per_view", False
        )
        if fun_viewpool is not None and not per_view:
            # source-view pooled features at each 3D point (reference
            # neural_radiance_field.py:106-116: concatenated to the
            # harmonic embedding before the trunk)
            embeds = jnp.concatenate([embeds, fun_viewpool(pts)], axis=-1)
        elif per_view:
            # un-aggregated pooling (reference NeRFormer
            # requires_pooling_without_aggregation :276): keep the
            # source-view axis; the transformer trunk attends across it
            if not self.use_transformer_trunk:
                raise ValueError(
                    "per-view pooling requires the transformer trunk"
                )
            pooled = fun_viewpool(pts)  # (V, ..., n_pts, C)
            V = pooled.shape[0]
            e = jnp.broadcast_to(embeds[None], (V,) + embeds.shape)
            embeds = jnp.concatenate([e, pooled], axis=-1)
        if self.use_transformer_trunk:
            features = self.xyz_encoder(embeds, embeds, pool_axis=per_view)
        elif self.color_dim == 3:
            # density + color heads fused into the trunk kernel on TPU
            # (models/nerf/implicit_function.py head= path; jnp oracle
            # elsewhere): returns packed (..., 4) [raw_density, logits]
            d_embed = self._dir_embed(
                embeds.shape[:-1], ray_bundle.directions
            )
            out4 = self.xyz_encoder(
                embeds, embeds, head=(d_embed, self._head_params())
            )
            densities = 1.0 - jnp.exp(-nn.softplus(out4[..., 0:1]))
            return densities, nn.sigmoid(out4[..., 1:4])
        else:
            features = self.xyz_encoder(embeds, embeds)
        raw_density = self._dense(self.density_layer, features)
        densities = 1.0 - jnp.exp(-nn.softplus(raw_density))
        colors = self._get_colors(features, ray_bundle.directions)
        return densities, colors


@registry.register
class NeuralRadianceFieldImplicitFunction(NeuralRadianceFieldBase):
    pass


@registry.register
class NeRFormerImplicitFunction(NeuralRadianceFieldBase):
    """NeRFormer: dual-axis transformer trunk (reference :259).

    Attends alternately over the un-aggregated source-view axis and the
    ray-point axis (decoding_functions.py:302); GenericModel supplies
    per-view pooled features (requires_pooling_without_aggregation)."""

    use_transformer_trunk: bool = True
    transformer_dim_down_factor: float = 2.0
    n_hidden_neurons_xyz: int = 80
    n_layers_xyz: int = 2
    append_xyz: Tuple[int, ...] = (1,)

    @staticmethod
    def requires_pooling_without_aggregation() -> bool:
        return True
