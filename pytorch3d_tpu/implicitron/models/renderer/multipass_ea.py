"""Multi-pass emission-absorption renderer (coarse + fine NeRF passes).

Parity: reference implicitron/models/renderer/multipass_ea.py:21
(`MultiPassEmissionAbsorptionRenderer`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ...tools.config import registry, run_auto_creation
from .base import BaseRenderer, EvaluationMode, ImplicitronRayBundle, RendererOutput
from .ray_point_refiner import RayPointRefiner
from .raymarcher import EmissionAbsorptionRaymarcher, RaymarcherBase


@registry.register
@dataclasses.dataclass
class MultiPassEmissionAbsorptionRenderer(BaseRenderer):
    """Coarse pass -> importance refine -> fine pass(es) (reference :21)."""

    n_pts_per_ray_fine_training: int = 64
    n_pts_per_ray_fine_evaluation: int = 64
    stratified_sampling_coarse_training: bool = True
    stratified_sampling_coarse_evaluation: bool = False
    append_coarse_samples_to_fine: bool = True
    density_noise_std_train: float = 0.0
    return_weights: bool = False
    raymarcher_class_type: str = "EmissionAbsorptionRaymarcher"
    raymarcher_args: Dict[str, Any] = dataclasses.field(default_factory=dict)
    blurpool_weights: bool = False
    sample_pdf_eps: float = 1e-5

    def __post_init__(self):
        self._refiners = {
            EvaluationMode.TRAINING: RayPointRefiner(
                n_pts_per_ray=self.n_pts_per_ray_fine_training,
                random_sampling=self.stratified_sampling_coarse_training,
                add_input_samples=self.append_coarse_samples_to_fine,
            ),
            EvaluationMode.EVALUATION: RayPointRefiner(
                n_pts_per_ray=self.n_pts_per_ray_fine_evaluation,
                random_sampling=self.stratified_sampling_coarse_evaluation,
                add_input_samples=self.append_coarse_samples_to_fine,
            ),
        }
        raymarcher_cls = registry.get(RaymarcherBase, self.raymarcher_class_type)
        self._raymarcher = raymarcher_cls(**self.raymarcher_args)

    def __call__(
        self,
        ray_bundle: ImplicitronRayBundle,
        implicit_functions: List = (),
        evaluation_mode: EvaluationMode = EvaluationMode.EVALUATION,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> RendererOutput:
        if not implicit_functions:
            raise ValueError("EA renderer expects implicit functions")

        density_noise_std = (
            self.density_noise_std_train
            if evaluation_mode == EvaluationMode.TRAINING
            else 0.0
        )

        fn_kwargs = {
            k: kwargs[k]
            for k in ("fun_viewpool", "camera", "global_code")
            if kwargs.get(k) is not None
        }

        def render_pass(fn, bundle):
            densities, features = fn(
                ray_bundle=bundle,
                density_noise_std=density_noise_std,
                **fn_kwargs,
            )
            return self._raymarcher(
                densities,
                features,
                aux={},
                ray_lengths=bundle.lengths,
                density_noise_std=density_noise_std,
            )

        output = render_pass(implicit_functions[0], ray_bundle)
        weights = output.weights
        if self.return_weights:
            output.aux["weights"] = weights

        prev = output
        for fn in implicit_functions[1:]:
            refined = self._refiners[evaluation_mode](
                ray_bundle,
                jax.lax.stop_gradient(weights),
                blurpool_weights=self.blurpool_weights,
                sample_pdf_eps=self.sample_pdf_eps,
                key=key,
            )
            cur = render_pass(fn, refined)
            cur.prev_stage = prev
            weights = cur.weights
            prev = cur
        return prev
