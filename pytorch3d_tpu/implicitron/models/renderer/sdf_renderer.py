"""SDF renderer: sphere tracing + surface shading (IDR).

Parity: reference implicitron/models/renderer/sdf_renderer.py:27
(`SignedDistanceFunctionRenderer`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ...tools.config import registry
from .base import BaseRenderer, EvaluationMode, ImplicitronRayBundle, RendererOutput
from .ray_tracing import RayTracing
from .rgb_net import RayNormalColoringNetwork


@registry.register
@dataclasses.dataclass
class SignedDistanceFunctionRenderer(BaseRenderer):
    render_features_dimensions: int = 3
    object_bounding_sphere: float = 1.0
    ray_tracer_args: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # IDR surface shading network (reference sdf_renderer.py:32); None
    # falls back to reading colors directly from the implicit function's
    # feature channels (the pre-round-2 behavior).
    ray_normal_coloring_network_args: Optional[Dict[str, Any]] = None
    bg_color: tuple = (0.0,)
    # slope of the differentiable miss-mask sigmoid(-alpha * sdf)
    # (reference sdf_renderer.py:36)
    soft_mask_alpha: float = 50.0

    def __post_init__(self):
        args = dict(self.ray_tracer_args)
        args.setdefault("object_bounding_sphere", self.object_bounding_sphere)
        self._ray_tracer = RayTracing(**args)
        # constructed once here (outside any flax method) like the
        # LSTMRenderer core; GenericModel adopts it into its scope
        self._rgb_net = (
            RayNormalColoringNetwork(**self.ray_normal_coloring_network_args)
            if self.ray_normal_coloring_network_args is not None
            else None
        )

    @property
    def flax_module(self):
        """The learnable rgb network, adopted into the model scope by
        GenericModel (same mechanism as the LSTMRenderer core)."""
        return self._rgb_net

    @property
    def flax_module_kwarg(self) -> str:
        return "rgb_network"

    def requires_object_mask(self) -> bool:
        return True

    def __call__(
        self,
        ray_bundle: ImplicitronRayBundle,
        implicit_functions: List = (),
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        object_mask: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> RendererOutput:
        if not implicit_functions:
            raise ValueError("SDF renderer expects an implicit function")
        fn = implicit_functions[0]

        B = ray_bundle.origins.shape[0]
        spatial = ray_bundle.origins.shape[1:-1]
        R = 1
        for s in spatial:
            R *= s
        origins = ray_bundle.origins.reshape(B, R, 3)
        dirs = ray_bundle.directions.reshape(B, R, 3)
        dirs = dirs / jnp.clip(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        if object_mask is None:
            object_mask = jnp.ones((B, R), bool)
        else:
            object_mask = object_mask.reshape(B, R) > 0.5

        # materialize the field's parameters OUTSIDE the ray-tracing loops
        # (flax creates params at first call; creating them inside
        # lax.fori_loop during init leaks tracers)
        fn(origins[:1, :1])

        def sdf_only(p):
            return fn(p)[..., 0]

        grad_fn = jax.grad(lambda p: jnp.sum(sdf_only(p)))

        # the tracer's iterative search is NOT differentiated (reference
        # runs it under torch.no_grad, sdf_renderer.py:120); gradients
        # re-enter through sdf_output and _the sample-network
        # reparametrization_ below
        points, net_mask, dists = self._ray_tracer(
            lambda p: jax.lax.stop_gradient(sdf_only(p)),
            origins, object_mask, dirs,
        )  # (B*R, ...)
        points = jax.lax.stop_gradient(points)
        dists = jax.lax.stop_gradient(dists)

        dirs_flat = dirs.reshape(-1, 3)
        cam_flat = origins.reshape(-1, 3)
        mask_flat = object_mask.reshape(-1)

        sdf_output = fn(points)[..., 0:1]  # (B*R, 1), live gradients
        aux: Dict[str, Any] = {}

        if evaluation_mode == EvaluationMode.TRAINING:
            surface_mask = net_mask & mask_flat
            # differentiable surface points: t(theta) = t - (sdf(x;theta)
            # - sdf0) / <grad sdf, d>  (IDR implicit differentiation;
            # reference _sample_network, sdf_renderer.py:240)
            g_surf = jax.lax.stop_gradient(grad_fn(points))
            dot = jnp.sum(g_surf * dirs_flat, axis=-1, keepdims=True)
            dot_sign = jnp.where(dot >= 0.0, 1.0, -1.0)
            denom = jnp.clip(jnp.abs(dot), 1e-4) * dot_sign
            dists_theta = dists[:, None] - (
                sdf_output - jax.lax.stop_gradient(sdf_output)
            ) / denom
            pts_theta = cam_flat + dists_theta * dirs_flat
            pts_use = jnp.where(surface_mask[:, None], pts_theta, points)

            # eikonal sample set: uniform points in the bounding box +
            # the (detached) traced points (reference sdf_renderer.py:150)
            if key is None:
                key = jax.random.PRNGKey(0)
            n_eik = max(points.shape[0] // 2, 1)
            r = self.object_bounding_sphere
            eik = jax.random.uniform(
                key, (n_eik, 3), minval=-r, maxval=r
            )
            eik_all = jnp.concatenate([eik, points], axis=0)
            aux["grad_theta"] = grad_fn(eik_all)
        else:
            surface_mask = net_mask
            pts_use = points

        out = fn(pts_use)  # (B*R, 1 + C)
        rgb_network = kwargs.get("rgb_network")
        if rgb_network is not None:
            # IDR shading: color = rgb_net(points, view dirs, SDF
            # normals, feature vectors) (reference sdf_renderer.py:52,
            # rgb_net.py:84)
            feature_vectors = out[..., 1:]
            normals = grad_fn(pts_use)
            features = rgb_network(
                feature_vectors, pts_use, normals, dirs_flat
            )[..., : self.render_features_dimensions]
        else:
            features = out[..., 1 : 1 + self.render_features_dimensions]
        bg = jnp.broadcast_to(
            jnp.asarray(self.bg_color, jnp.float32),
            (self.render_features_dimensions,),
        )
        features = jnp.where(surface_mask[:, None], features, bg)

        # differentiable mask: hard 1 on traced surfaces, soft
        # sigmoid(-alpha * sdf) on misses — the BCE mask loss carves
        # free space through this branch (reference sdf_renderer.py:221,
        # eq. (7) of the IDR paper)
        soft = jax.nn.sigmoid(-self.soft_mask_alpha * sdf_output)
        mask = jnp.where(surface_mask[:, None], 1.0, soft)
        depth = dists[:, None]
        return RendererOutput(
            features=features.reshape((B,) + spatial + (-1,)),
            depths=depth.reshape((B,) + spatial + (1,)),
            masks=mask.reshape((B,) + spatial + (1,)),
            aux=aux,
        )
