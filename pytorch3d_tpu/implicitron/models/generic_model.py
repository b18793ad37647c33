"""GenericModel: the pluggable neural-rendering pipeline.

Parity: reference implicitron/models/generic_model.py:64 (pipeline doc
:73-118): raysample -> [view pooling] -> implicit function(s) -> renderer
-> metrics/losses.  Chunked full-grid eval (reference `_render` :597,
`chunk_size_grid` :215) becomes a `lax.map` over static ray chunks — and,
on multi-chip meshes, those chunks are instead *sharded* over the "rays"
axis (pytorch3d_tpu/parallel).

The model is a flax module; pluggable components come from the implicitron
registry (`raysampler_class_type`, `renderer_class_type`,
`implicit_function_class_type`) with `*_args` dicts, mirroring the
reference's Configurable fields (generic_model.py:224-262).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..tools.config import registry
from .base_model import ImplicitronModelBase, ImplicitronRender  # noqa: F401
from .implicit_function.base import ImplicitFunctionBase
from .implicit_function.neural_radiance_field import (  # noqa: F401 (register)
    NeRFormerImplicitFunction,
    NeuralRadianceFieldImplicitFunction,
)
from .metrics import RegularizationMetrics, ViewMetrics
from .renderer.base import BaseRenderer, EvaluationMode, ImplicitronRayBundle
from .renderer.multipass_ea import (  # noqa: F401 (register)
    MultiPassEmissionAbsorptionRenderer,
)
from .renderer.ray_sampler import (  # noqa: F401 (register)
    AdaptiveRaySampler,
    NearFarRaySampler,
    RaySamplerBase,
)


def _default_loss_weights() -> Dict[str, float]:
    return {"loss_rgb_mse": 1.0, "loss_prev_stage_rgb_mse": 1.0}


@registry.register
class GenericModel(nn.Module, ImplicitronModelBase):
    """Pluggable raysampler -> implicit fn(s) -> renderer -> losses."""

    render_image_width: int = 400
    render_image_height: int = 400
    num_passes: int = 2
    chunk_size_grid: int = 4096
    # input preprocessing (reference generic_model.py:207-213 +
    # models/utils.py:25 `preprocess_input`): threshold the fg mask, and
    # optionally replace the image/depth background with `bg_color`/zero
    # before the model ever sees them.
    mask_images: bool = True
    mask_depths: bool = True
    mask_threshold: float = 0.5
    bg_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    raysampler_class_type: str = "AdaptiveRaySampler"
    raysampler_args: Optional[Dict[str, Any]] = None
    renderer_class_type: str = "MultiPassEmissionAbsorptionRenderer"
    renderer_args: Optional[Dict[str, Any]] = None
    implicit_function_class_type: str = "NeuralRadianceFieldImplicitFunction"
    implicit_function_args: Optional[Dict[str, Any]] = None
    # weight sharing / heterogeneous passes (reference overfit_model.py:152):
    # share_implicit_function_across_passes reuses ONE implicit function
    # (same parameters) for every pass; coarse_implicit_function_* give
    # the FIRST pass its own architecture.
    share_implicit_function_across_passes: bool = False
    coarse_implicit_function_class_type: Optional[str] = None
    coarse_implicit_function_args: Optional[Dict[str, Any]] = None
    loss_weights: Optional[Dict[str, float]] = None

    # view pooling: sample per-point features from source views (NeRFormer /
    # IDR style, reference generic_model.py view_pooler/image_feature_extractor)
    view_pooler_enabled: bool = False
    image_feature_extractor_args: Optional[Dict[str, Any]] = None
    view_pooler_args: Optional[Dict[str, Any]] = None

    # global per-sequence / per-time code concatenated to implicit fn input
    global_encoder_class_type: Optional[str] = None
    global_encoder_args: Optional[Dict[str, Any]] = None

    def setup(self):
        rs_cls = registry.get(RaySamplerBase, self.raysampler_class_type)
        rs_args = dict(self.raysampler_args or {})
        rs_args.setdefault("image_width", self.render_image_width)
        rs_args.setdefault("image_height", self.render_image_height)
        self._raysampler = rs_cls(**rs_args)

        rend_cls = registry.get(BaseRenderer, self.renderer_class_type)
        self._renderer = rend_cls(**(self.renderer_args or {}))
        # adopt the renderer's learnable flax core (e.g. the LSTMRenderer's
        # LSTM) into this model's scope so it trains with everything else
        renderer_module = getattr(self._renderer, "flax_module", None)
        if renderer_module is not None:
            self._renderer_flax_module = renderer_module

        fn_cls = registry.get(
            ImplicitFunctionBase, self.implicit_function_class_type
        )
        if self.share_implicit_function_across_passes:
            shared = fn_cls(
                **(self.implicit_function_args or {}),
                name="implicit_function_0",
            )
            self._implicit_functions = [shared] * self.num_passes
        else:
            def make_fn(i):
                if i == 0 and self.coarse_implicit_function_class_type:
                    coarse_cls = registry.get(
                        ImplicitFunctionBase,
                        self.coarse_implicit_function_class_type,
                    )
                    return coarse_cls(
                        **(self.coarse_implicit_function_args or {}),
                        name="implicit_function_0",
                    )
                return fn_cls(
                    **(self.implicit_function_args or {}),
                    name=f"implicit_function_{i}",
                )

            self._implicit_functions = [
                make_fn(i) for i in range(self.num_passes)
            ]
        if self.view_pooler_enabled:
            from .feature_extractor.resnet_feature_extractor import (
                ResNetFeatureExtractor,
            )
            from .view_pooler.view_pooler import ViewPooler

            self._image_feature_extractor = ResNetFeatureExtractor(
                **(self.image_feature_extractor_args or {})
            )
            self._view_pooler = ViewPooler(**(self.view_pooler_args or {}))

        if self.global_encoder_class_type:
            from .global_encoder.global_encoder import GlobalEncoderBase

            enc_cls = registry.get(
                GlobalEncoderBase, self.global_encoder_class_type
            )
            self._global_encoder = enc_cls(**(self.global_encoder_args or {}))

        self._view_metrics = ViewMetrics()
        self._reg_metrics = RegularizationMetrics()

    # ------------------------------------------------------------------ #
    # epoch-scheduled module updates (reference generic_model.py routes
    # `subscribe_to_epochs` through the training loop; here they are pure
    # transforms of the variables pytree applied between jitted steps)
    # ------------------------------------------------------------------ #

    def _standalone_implicit_function(self):
        fn_cls = registry.get(
            ImplicitFunctionBase, self.implicit_function_class_type
        )
        return fn_cls(**(self.implicit_function_args or {}), parent=None)

    def epoch_subscriptions(self) -> tuple:
        """Epochs at which `apply_epoch_callbacks` must run (e.g. voxel
        grid resolution changes / scaffold / cropping)."""
        fn = self._standalone_implicit_function()
        if hasattr(fn, "subscribe_to_epochs"):
            return tuple(fn.subscribe_to_epochs())
        return ()

    def apply_epoch_callbacks(self, variables, epoch: int):
        """Applies scheduled updates to every implicit function's
        variables subtree. Returns (new variables, params_changed) —
        when params_changed the caller must rebuild optimizer state.
        Host-side (between jitted steps)."""
        fn = self._standalone_implicit_function()
        if not hasattr(fn, "apply_epoch"):
            return variables, False
        out = {k: dict(v) for k, v in variables.items()}
        changed = False
        for i in range(self.num_passes):
            name = f"implicit_function_{i}"
            sub = {
                coll: out[coll][name]
                for coll in out
                if name in out[coll]
            }
            if not sub:
                continue
            new_sub, ch = fn.apply_epoch(sub, epoch)
            for coll, tree in new_sub.items():
                if coll in out and name in out[coll]:
                    out[coll][name] = tree
            changed = changed or ch
        return out, changed

    def __call__(
        self,
        *,
        image_rgb: Optional[jnp.ndarray] = None,  # (N, H, W, 3)
        camera=None,
        fg_probability: Optional[jnp.ndarray] = None,  # (N, H, W, 1)
        depth_map: Optional[jnp.ndarray] = None,  # (N, H, W, 1)
        evaluation_mode: EvaluationMode = EvaluationMode.TRAINING,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        if key is None:
            key = jax.random.PRNGKey(0)
        k_rays, k_render = jax.random.split(key)

        image_rgb, fg_probability, depth_map = self._preprocess_input(
            image_rgb, fg_probability, depth_map
        )
        mask = (
            fg_probability[..., 0]
            if fg_probability is not None
            else None
        )
        ray_bundle = self._raysampler(
            camera, evaluation_mode, mask=mask, key=k_rays
        )

        implicit_functions = self._implicit_functions

        renderer_kwargs = {}
        if getattr(self._renderer, "flax_module", None) is not None:
            kw = getattr(self._renderer, "flax_module_kwarg", "lstm_module")
            renderer_kwargs[kw] = self._renderer_flax_module
        if self.view_pooler_enabled and image_rgb is not None:
            # keep the extractor's input channel count fixed across calls:
            # a missing mask becomes all-ones
            masks_in = fg_probability
            if masks_in is None:
                masks_in = jnp.ones(
                    image_rgb.shape[:-1] + (1,), image_rgb.dtype
                )
            img_feats = self._image_feature_extractor(
                image_rgb, masks=masks_in
            )
            img_feats = {
                k: v for k, v in img_feats.items() if k != "global_code"
            }
            pooler = self._view_pooler
            src_camera = camera
            needs_per_view = any(
                getattr(f, "requires_pooling_without_aggregation", lambda: False)()
                for f in implicit_functions
            )

            if needs_per_view:
                # un-aggregated pooling for NeRFormer-style trunks: keep
                # the source-view axis (reference generic_model.py
                # requires_pooling_without_aggregation handling)
                def fun_viewpool(pts):
                    # pts (..., 3) -> (V, ..., C) per-view features
                    flat = pts.reshape(1, -1, 3)
                    sampled, _ = pooler.sample_per_view(
                        pts=flat, camera=src_camera, feats=img_feats,
                        masks=None,
                    )
                    per = jnp.concatenate(
                        [sampled[k] for k in sorted(sampled)], axis=-1
                    )  # (V, P, C)
                    V, _, C = per.shape
                    return per.reshape((V,) + pts.shape[:-1] + (C,))

                fun_viewpool.per_view = True
            else:

                def fun_viewpool(pts):
                    # pts (..., 3) -> (..., C_agg): pooled source-view
                    # features
                    flat = pts.reshape(1, -1, 3)
                    pooled = pooler(
                        pts=flat, camera=src_camera, feats=img_feats,
                        masks=None,
                    )
                    agg = jnp.concatenate(
                        [pooled[k] for k in sorted(pooled)], axis=-1
                    )
                    return agg.reshape(pts.shape[:-1] + (agg.shape[-1],))

            renderer_kwargs["fun_viewpool"] = fun_viewpool
            renderer_kwargs["camera"] = camera
        if self.global_encoder_class_type:
            renderer_kwargs["global_code"] = self._global_encoder(
                sequence_name=kwargs.get("sequence_name"),
                frame_timestamp=kwargs.get("frame_timestamp"),
            )

        if (
            evaluation_mode == EvaluationMode.EVALUATION
            and self.chunk_size_grid > 0
        ):
            rendered = self._render_chunked(
                ray_bundle,
                implicit_functions,
                evaluation_mode,
                k_render,
                renderer_kwargs,
            )
        else:
            rendered = self._renderer(
                ray_bundle,
                implicit_functions=implicit_functions,
                evaluation_mode=evaluation_mode,
                key=k_render,
                **renderer_kwargs,
            )

        preds: Dict[str, Any] = {
            "images_render": rendered.features,
            "depths_render": rendered.depths,
            "masks_render": rendered.masks,
            "implicitron_render": rendered,
        }

        # losses on this pass and recursively on prev stages
        results: Dict[str, Any] = {}
        self._view_metrics(
            results,
            rendered,
            image_rgb=image_rgb,
            depth_map=depth_map,
            fg_probability=fg_probability,
            xys=ray_bundle.xys,
            camera_ids=ray_bundle.camera_ids,
        )
        stage = rendered.prev_stage
        prefix = "loss_prev_stage_"
        while stage is not None:
            self._view_metrics(
                results,
                stage,
                image_rgb=image_rgb,
                depth_map=depth_map,
                fg_probability=fg_probability,
                xys=ray_bundle.xys,
                camera_ids=ray_bundle.camera_ids,
                keys_prefix=prefix,
            )
            stage = stage.prev_stage
            prefix = "loss_prev_stage_" + prefix[len("loss_") :]
        self._reg_metrics(results, model=self, raymarched=rendered)
        preds.update(results)

        # weighted objective
        weights = self.loss_weights or _default_loss_weights()
        objective = 0.0
        used = False
        for name, w in weights.items():
            if name in results and w != 0.0:
                objective = objective + w * results[name]
                used = True
        preds["objective"] = (
            objective if used else jnp.asarray(0.0, jnp.float32)
        )
        return preds

    def _preprocess_input(self, image_rgb, fg_probability, depth_map):
        """Threshold the fg mask and mask the image/depth backgrounds
        (reference models/utils.py:25 `preprocess_input`; channel-last
        here). The loss then supervises against the MASKED image, so a
        renderer with the matching bg_color learns an object-confined
        field instead of spending capacity on the background."""
        fg_mask = fg_probability
        if fg_mask is not None and self.mask_threshold > 0.0:
            fg_mask = (fg_mask >= self.mask_threshold).astype(fg_mask.dtype)
        if self.mask_images and fg_mask is not None and image_rgb is not None:
            bg = jnp.asarray(self.bg_color, image_rgb.dtype)
            image_rgb = image_rgb * fg_mask + bg * (1.0 - fg_mask)
        if self.mask_depths and fg_mask is not None and depth_map is not None:
            depth_map = depth_map * fg_mask
        return image_rgb, fg_mask, depth_map

    # ------------------------------------------------------------------ #
    def _render_chunked(
        self, ray_bundle, implicit_functions, evaluation_mode, key,
        renderer_kwargs=None,
    ):
        """Full-grid rendering in ray chunks (reference _render :597)."""
        B = ray_bundle.origins.shape[0]
        spatial = ray_bundle.origins.shape[1:-1]
        n_rays = 1
        for s in spatial:
            n_rays *= s
        chunk = min(self.chunk_size_grid, n_rays)
        n_chunks = -(-n_rays // chunk)
        pad = n_chunks * chunk - n_rays

        def flat(x, d):
            x = x.reshape(B, n_rays, d)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            return jnp.moveaxis(
                x.reshape(B, n_chunks, chunk, d), 1, 0
            )  # (n_chunks, B, chunk, d)

        S = ray_bundle.lengths.shape[-1]
        chunks = (
            flat(ray_bundle.origins, 3),
            flat(ray_bundle.directions, 3),
            flat(ray_bundle.lengths, S),
            flat(ray_bundle.xys, 2),
        )

        def render_one(args):
            o, d, l, xy = args
            rb = ImplicitronRayBundle(
                origins=o, directions=d, lengths=l, xys=xy
            )
            out = self._renderer(
                rb,
                implicit_functions=implicit_functions,
                evaluation_mode=evaluation_mode,
                key=key,
                **(renderer_kwargs or {}),
            )
            return out.features, out.depths, out.masks

        feats, depths, masks = jax.lax.map(render_one, chunks)

        def unflat(x):
            d = x.shape[-1]
            x = jnp.moveaxis(x, 0, 1).reshape(B, n_chunks * chunk, d)
            return x[:, :n_rays].reshape((B,) + spatial + (d,))

        from .renderer.base import RendererOutput

        return RendererOutput(
            features=unflat(feats), depths=unflat(depths), masks=unflat(masks)
        )
