"""Scene Representation Networks (SRN) implicit functions.

Parity: reference
implicitron/models/implicit_function/scene_representation_networks.py
(`SRNRaymarchFunction`, `SRNPixelGenerator`, `SRNImplicitFunction`,
`SRNHyperNetImplicitFunction`) + third_party/pytorch_prototyping FC blocks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ....renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ....renderer.implicit.utils import ray_bundle_to_ray_points
from ...tools.config import registry
from .base import ImplicitFunctionBase


class _FCBlock(nn.Module):
    """third_party/pytorch_prototyping.FCBlock equivalent."""

    hidden_ch: int
    num_hidden_layers: int
    out_features: int
    outermost_linear: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.LayerNorm()(nn.Dense(self.hidden_ch)(x)))
        for _ in range(self.num_hidden_layers):
            y = nn.relu(nn.LayerNorm()(nn.Dense(self.hidden_ch)(y)))
        y = nn.Dense(self.out_features)(y)
        if not self.outermost_linear:
            y = nn.relu(nn.LayerNorm()(y))
        return y


class SRNRaymarchFunction(nn.Module):
    """Point -> feature field used by the LSTM raymarcher (reference)."""

    n_harmonic_functions: int = 3
    n_hidden_units: int = 256
    n_layers: int = 2
    in_features: int = 3
    out_features: int = 256
    latent_dim: int = 0

    def setup(self):
        self.embed = HarmonicEmbedding(self.n_harmonic_functions)
        self.net = _FCBlock(
            hidden_ch=self.n_hidden_units,
            num_hidden_layers=self.n_layers,
            out_features=self.out_features,
        )

    def __call__(self, points: jnp.ndarray, global_code=None, **kwargs):
        x = self.embed(points)
        if global_code is not None:
            g = jnp.broadcast_to(
                global_code, points.shape[:-1] + (global_code.shape[-1],)
            )
            x = jnp.concatenate([x, g], axis=-1)
        return self.net(x)


class SRNPixelGenerator(nn.Module):
    """Feature -> (density, color) head (reference)."""

    n_harmonic_functions: int = 4
    n_hidden_units: int = 256
    n_hidden_units_color: int = 128
    n_layers: int = 2
    in_features: int = 256
    out_features: int = 3
    ray_dir_in_camera_coords: bool = False

    def setup(self):
        self.embed_dir = HarmonicEmbedding(self.n_harmonic_functions)
        self.net = _FCBlock(
            hidden_ch=self.n_hidden_units,
            num_hidden_layers=self.n_layers,
            out_features=self.n_hidden_units,
        )
        self.density_layer = nn.Dense(1)
        self.color_hidden = nn.Dense(self.n_hidden_units_color)
        self.color_out = nn.Dense(self.out_features)

    def __call__(self, features: jnp.ndarray, directions: jnp.ndarray):
        f = self.net(features)
        densities = 1.0 - jnp.exp(-nn.softplus(self.density_layer(f)))
        d = directions / jnp.clip(
            jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12
        )
        d_embed = self.embed_dir(d)
        d_embed = jnp.broadcast_to(
            d_embed[..., None, :], f.shape[:-1] + (d_embed.shape[-1],)
        )
        h = nn.relu(self.color_hidden(jnp.concatenate([f, d_embed], axis=-1)))
        colors = nn.sigmoid(self.color_out(h))
        return densities, colors


@registry.register
class SRNImplicitFunction(nn.Module, ImplicitFunctionBase):
    """SRN field: raymarch FC trunk + pixel generator (reference)."""

    n_harmonic_functions: int = 3
    n_hidden_units: int = 256
    n_layers: int = 2
    latent_dim: int = 0

    def setup(self):
        self.raymarch_function = SRNRaymarchFunction(
            n_harmonic_functions=self.n_harmonic_functions,
            n_hidden_units=self.n_hidden_units,
            n_layers=self.n_layers,
            latent_dim=self.latent_dim,
        )
        self.pixel_generator = SRNPixelGenerator(
            in_features=self.n_hidden_units
        )

    def __call__(self, ray_bundle, global_code=None, **kwargs):
        pts = ray_bundle_to_ray_points(ray_bundle)
        feats = self.raymarch_function(pts, global_code=global_code)
        return self.pixel_generator(feats, ray_bundle.directions)


class _Hypernet(nn.Module):
    """third_party/hyperlayers-style hypernetwork: latent -> MLP weights."""

    hyper_hidden: int = 256
    target_in: int = 256
    target_out: int = 256

    @nn.compact
    def __call__(self, latent, x):
        h = nn.relu(nn.Dense(self.hyper_hidden)(latent))
        W = nn.Dense(self.target_in * self.target_out)(h).reshape(
            self.target_in, self.target_out
        )
        b = nn.Dense(self.target_out)(h)
        return x @ W + b


class SRNRaymarchHyperNet(nn.Module):
    """The hypernetwork-driven raymarch trunk: a latent code generates
    the weights of the 2-layer point MLP (reference
    scene_representation_networks.py `SRNRaymarchHyperNet`)."""

    latent_dim: int = 64
    n_hidden_units: int = 128
    n_harmonic_functions: int = 3

    def setup(self):
        self.embed = HarmonicEmbedding(self.n_harmonic_functions)
        in_dim = self.embed.get_output_dim(3)
        self.hyper1 = _Hypernet(
            target_in=in_dim, target_out=self.n_hidden_units
        )
        self.hyper2 = _Hypernet(
            target_in=self.n_hidden_units, target_out=self.n_hidden_units
        )

    def __call__(self, latent: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
        x = self.embed(pts)
        h = nn.relu(self.hyper1(latent, x))
        return nn.relu(self.hyper2(latent, h))


@registry.register
class SRNHyperNetImplicitFunction(nn.Module, ImplicitFunctionBase):
    """SRN whose trunk weights come from a hypernetwork on a scene latent
    (reference SRNHyperNetImplicitFunction)."""

    latent_dim: int = 64
    n_hidden_units: int = 128
    n_harmonic_functions: int = 3

    def setup(self):
        self.raymarch_function = SRNRaymarchHyperNet(
            latent_dim=self.latent_dim,
            n_hidden_units=self.n_hidden_units,
            n_harmonic_functions=self.n_harmonic_functions,
        )
        self.pixel_generator = SRNPixelGenerator(
            in_features=self.n_hidden_units,
            n_hidden_units=self.n_hidden_units,
        )
        self.default_latent = self.param(
            "default_latent", nn.initializers.normal(0.01), (self.latent_dim,)
        )

    def __call__(self, ray_bundle, global_code=None, **kwargs):
        latent = (
            global_code if global_code is not None else self.default_latent
        )
        pts = ray_bundle_to_ray_points(ray_bundle)
        h = self.raymarch_function(latent, pts)
        return self.pixel_generator(h, ray_bundle.directions)
