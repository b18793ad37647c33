"""NeRF implicit function as a flax module.

Parity: reference projects/nerf/nerf/implicit_function.py:21
(`NeuralRadianceField`), :229 (`MLPWithInputSkips`).

TPU notes: the MLP evaluation over ray points is the NeRF hot loop — pure
batched matmuls that XLA tiles onto the MXU.  Ray points are flattened to a
(R*S, D) matrix so every Dense layer is one large GEMM; bfloat16 activations
are used when `dtype` says so, with fp32 accumulation (flax default).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...renderer.implicit.harmonic_embedding import HarmonicEmbedding
from ...renderer.implicit.utils import ray_bundle_to_ray_points


_XAVIER = nn.initializers.xavier_uniform()  # reference _xavier_init parity


class _DenseParams(nn.Module):
    """Holds one Dense layer's kernel/bias under the same param names as
    `nn.Dense`, so the fused-Pallas path below shares checkpoints with
    the layer-by-layer path."""

    features: int
    in_features: int
    kernel_init: nn.initializers.Initializer = _XAVIER

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        return kernel, bias


class MLPWithInputSkips(nn.Module):
    """MLP that concatenates a skip input at given layers (reference :229).

    On TPU, when the skip input IS the trunk input (the NeRF case), the
    whole stack runs as ONE fused Pallas kernel with all weights
    VMEM-resident (ops/fused_mlp_pallas.py) — layer-by-layer execution
    is HBM-bound at ~0.53 MFU for 256-wide layers, the fused chain is
    compute-bound.  Everywhere else (CPU, or distinct skip input) the
    layer-by-layer path runs; both share the same parameters.
    """

    n_layers: int
    output_dim: int
    skip_dim: int
    hidden_dim: int
    input_skips: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32
    use_fused_pallas: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        z: jnp.ndarray,
        head: Optional[tuple] = None,
    ) -> jnp.ndarray:
        """head, if given, is (d_embed (..., Ddir), head_params 9-tuple)
        — the NeRF density/color head is then evaluated INSIDE the same
        fused kernel as the trunk (ops/fused_mlp_pallas.fused_nerf_field)
        and the return value is the packed (..., 4) [raw_density,
        rgb_logits] instead of the trunk features."""
        d_in = x.shape[-1]
        kernels, biases = [], []
        for li in range(self.n_layers):
            in_dim = self.hidden_dim if li > 0 else d_in
            if li in self.input_skips:
                in_dim += z.shape[-1]
            k, b = _DenseParams(
                features=self.hidden_dim, in_features=in_dim,
                name=f"layer{li}",
            )()
            kernels.append(k)
            biases.append(b)

        n_rows = 1
        for s in x.shape[:-1]:
            n_rows *= s
        fused_ok = (
            self.use_fused_pallas
            and jax.default_backend() == "tpu"
            and x is z  # the fused kernel concats the trunk input itself
            and x.ndim >= 2
            # lane alignment: Mosaic wants the hidden dim on full 128
            # lanes; narrower configs (tiny test MLPs) stay layer-by-layer
            and self.hidden_dim % 128 == 0
            # size gate: below ~16M row*hidden elements the kernel's
            # fixed dispatch cost beats its HBM savings (measured:
            # train-parity 32k x 128 steps got ~35% SLOWER fused, while
            # the 262k x 256 NeRF batch gets 45% faster) — small
            # problems stay on XLA's fused layer-by-layer path
            and n_rows * self.hidden_dim >= (1 << 24)
        )
        ks = tuple(k.astype(self.dtype) for k in kernels)
        bs = tuple(b.astype(self.dtype) for b in biases)
        skips = tuple(self.input_skips)

        if head is not None:
            d_embed, head_params = head
            hp = tuple(p.astype(self.dtype) for p in head_params)
            flat = x.reshape(-1, d_in).astype(self.dtype)
            flat_de = d_embed.reshape(-1, d_embed.shape[-1])
            if fused_ok and hp[4].shape[1] % 128 == 0:
                from ...ops.fused_mlp_pallas import fused_nerf_field

                out = fused_nerf_field(flat, flat_de, ks, bs, hp, skips)
            elif fused_ok:
                # trunk still rides the fused kernel; only the
                # non-lane-aligned head falls back to jnp
                from ...ops.fused_mlp_pallas import (
                    fused_head_reference,
                    fused_mlp,
                )

                y = fused_mlp(flat, ks, bs, skips)
                out = fused_head_reference(y, flat_de, hp, self.dtype)
            else:
                from ...ops.fused_mlp_pallas import (
                    fused_nerf_field_reference,
                )

                out = fused_nerf_field_reference(
                    flat, flat_de, ks, bs, hp, skips
                )
            return out.reshape(x.shape[:-1] + (4,))

        if fused_ok:
            from ...ops.fused_mlp_pallas import fused_mlp

            flat = x.reshape(-1, d_in).astype(self.dtype)
            out = fused_mlp(flat, ks, bs, skips)
            return out.reshape(x.shape[:-1] + (self.hidden_dim,))

        y = x.astype(self.dtype)
        zc = z.astype(self.dtype)
        for li in range(self.n_layers):
            if li in self.input_skips:
                y = jnp.concatenate([y, zc], axis=-1)
            y = jnp.dot(
                y, kernels[li].astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) + biases[li].astype(jnp.float32)
            y = nn.relu(y).astype(self.dtype)
        return y


class NeuralRadianceField(nn.Module):
    """NeRF MLP: density + view-dependent color (reference :21)."""

    n_harmonic_functions_xyz: int = 6
    n_harmonic_functions_dir: int = 4
    n_hidden_neurons_xyz: int = 256
    n_hidden_neurons_dir: int = 128
    n_layers_xyz: int = 8
    append_xyz: Tuple[int, ...] = (5,)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.harmonic_embedding_xyz = HarmonicEmbedding(
            self.n_harmonic_functions_xyz
        )
        self.harmonic_embedding_dir = HarmonicEmbedding(
            self.n_harmonic_functions_dir
        )
        embedding_dim_xyz = self.harmonic_embedding_xyz.get_output_dim(3)
        self.mlp_xyz = MLPWithInputSkips(
            n_layers=self.n_layers_xyz,
            output_dim=self.n_hidden_neurons_xyz,
            skip_dim=embedding_dim_xyz,
            hidden_dim=self.n_hidden_neurons_xyz,
            input_skips=self.append_xyz,
            dtype=self.dtype,
        )
        # head layers as raw (kernel, bias) holders so the fused-field
        # Pallas path can take them by value; names/param-trees identical
        # to the previous nn.Dense layout.  density bias starts at 0 like
        # the reference (flax default); xavier weights avoid the
        # all-transparent init the reference comments about
        # (implicit_function.py:79-84)
        H = self.n_hidden_neurons_xyz
        embedding_dim_dir = self.harmonic_embedding_dir.get_output_dim(3)
        self.intermediate_linear = _DenseParams(features=H, in_features=H)
        self.density_layer = _DenseParams(features=1, in_features=H)
        self.color_layer_hidden = _DenseParams(
            features=self.n_hidden_neurons_dir,
            in_features=H + embedding_dim_dir,
        )
        self.color_layer_out = _DenseParams(
            features=3, in_features=self.n_hidden_neurons_dir
        )

    def _head_params(self) -> tuple:
        """The 9 raw head arrays in fused_nerf_field order; the concat
        order of the color input ([intermediate(features), d_embed])
        maps to the (wc1a, wc1b) row split."""
        wi, bi = self.intermediate_linear()
        wd, bd = self.density_layer()
        wc1, bc1 = self.color_layer_hidden()
        wc2, bc2 = self.color_layer_out()
        H = self.n_hidden_neurons_xyz
        return (wd, bd, wi, bi, wc1[:H], wc1[H:], bc1, wc2, bc2)

    def _densities_from_raw(
        self,
        raw: jnp.ndarray,  # (..., S, 1) pre-activation density
        depth_values: jnp.ndarray,  # (..., S) ray lengths
        density_noise_std: float = 0.0,
        noise_key=None,
    ) -> jnp.ndarray:
        """Raw densities -> [0,1] opacities, re-weighted by the depth step
        sizes: 1 - exp(-deltas * relu(raw)) (reference
        implicit_function.py:96-120).  The delta weighting makes opacity
        invariant to the per-ray sampling resolution; the final sample gets
        a quasi-infinite delta."""
        deltas = jnp.concatenate(
            [
                depth_values[..., 1:] - depth_values[..., :-1],
                jnp.full_like(depth_values[..., :1], 1e10),
            ],
            axis=-1,
        )[..., None]
        # branch only on key presence: density_noise_std may be traced
        # (e.g. under nn.remat); callers pass noise_key=None to disable
        if noise_key is not None:
            raw = raw + density_noise_std * jax.random.normal(
                noise_key, raw.shape, raw.dtype
            )
        return 1.0 - jnp.exp(-deltas * nn.relu(raw))

    def __call__(
        self,
        ray_bundle,
        density_noise_std: float = 0.0,
        noise_key=None,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ray_bundle with origins/directions (..., 3), lengths (..., S).

        Returns (densities (..., S, 1), colors (..., S, 3)).

        The trunk AND both heads evaluate inside one Pallas kernel on TPU
        (MLPWithInputSkips head= path); only the packed (..., S, 4)
        [raw_density, rgb_logits] crosses HBM, and the cheap elementwise
        tails (delta-opacity transform, sigmoid) fuse into the
        raymarcher downstream.
        """
        rays_points_world = ray_bundle_to_ray_points(ray_bundle)  # (..., S, 3)
        embeds_xyz = self.harmonic_embedding_xyz(rays_points_world)
        spatial = embeds_xyz.shape[:-1]  # (..., S)

        d = ray_bundle.directions / jnp.clip(
            jnp.linalg.norm(ray_bundle.directions, axis=-1, keepdims=True),
            1e-12,
        )
        d_embed = self.harmonic_embedding_dir(d)  # (..., Ddir)
        d_embed = jnp.broadcast_to(
            d_embed[..., None, :], spatial + (d_embed.shape[-1],)
        )

        out4 = self.mlp_xyz(
            embeds_xyz, embeds_xyz, head=(d_embed, self._head_params())
        )
        densities = self._densities_from_raw(
            out4[..., 0:1].astype(jnp.float32),
            ray_bundle.lengths,
            density_noise_std,
            noise_key,
        )
        colors = nn.sigmoid(out4[..., 1:4].astype(jnp.float32))
        return densities, colors
