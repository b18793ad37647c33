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

        points, net_mask, dists = self._ray_tracer(
            sdf_only, origins, object_mask, dirs
        )  # (B*R, ...)

        out = fn(points)  # (B*R, 1 + C)
        rgb_network = kwargs.get("rgb_network")
        if rgb_network is not None:
            # IDR shading: color = rgb_net(points, view dirs, SDF
            # normals, feature vectors) (reference sdf_renderer.py:52,
            # rgb_net.py:84)
            feature_vectors = out[..., 1:]
            normals = jax.grad(lambda p: fn(p)[..., 0].sum())(points)
            view_dirs = dirs.reshape(-1, 3)
            features = rgb_network(
                feature_vectors, points, normals, view_dirs
            )[..., : self.render_features_dimensions]
        else:
            features = out[..., 1 : 1 + self.render_features_dimensions]
        features = jnp.where(net_mask[:, None], features, 0.0)

        mask = net_mask.astype(jnp.float32)[:, None]
        depth = dists[:, None]
        return RendererOutput(
            features=features.reshape((B,) + spatial + (-1,)),
            depths=depth.reshape((B,) + spatial + (1,)),
            masks=mask.reshape((B,) + spatial + (1,)),
        )
