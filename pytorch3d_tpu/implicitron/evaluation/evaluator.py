"""Implicitron evaluator: run eval over a test loader, aggregate, dump JSON.

Parity: reference implicitron/evaluation/evaluator.py:48
(`ImplicitronEvaluator`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import jax

from ..models.renderer.base import EvaluationMode
from ..tools.config import Configurable, ReplaceableBase, registry
from .evaluate_new_view_synthesis import (
    aggregate_nvs_results,
    eval_batch,
    summarize_nvs_eval_results,
)


class EvaluatorBase(ReplaceableBase):
    """Replaceable base: evaluate a trained model on given data
    (reference evaluator.py:30)."""

    is_multisequence: bool = False

    def run(self, model, params, dataloader, **kwargs):
        raise NotImplementedError


@registry.register
@dataclasses.dataclass
class ImplicitronEvaluator(EvaluatorBase, Configurable):
    """Evaluate new-view synthesis over a test data loader (reference :48)."""

    camera_difficulty_bin_breaks: tuple = (0.97, 0.98)
    is_multisequence: bool = False
    compute_lpips: bool = True

    def run(
        self,
        model,
        params,
        dataloader,
        exp_dir: Optional[str] = None,
        dump_to_json: bool = False,
        epoch: Optional[int] = None,
        **kwargs,
    ) -> List[Dict[str, Any]]:
        """Returns per-batch eval results; optionally dumps aggregate JSON
        (flat summary + per-subset breakdown, reference evaluator.py:93)."""
        lpips_model = None
        if self.compute_lpips:
            from ..tools.lpips import LPIPSSubstitute

            lpips_model = LPIPSSubstitute()
        per_batch = []
        for frame_data in dataloader:
            preds = model.apply(
                params,
                image_rgb=frame_data.image_rgb,
                camera=frame_data.camera,
                fg_probability=frame_data.fg_probability,
                evaluation_mode=EvaluationMode.EVALUATION,
            )
            per_batch.append(
                eval_batch(frame_data, preds, lpips_model=lpips_model)
            )
        flat, aux = summarize_nvs_eval_results(
            per_batch,
            is_multisequence=self.is_multisequence,
            camera_difficulty_bin_breaks=self.camera_difficulty_bin_breaks,
        )
        agg = aggregate_nvs_results(per_batch)
        if dump_to_json and exp_dir:
            path = os.path.join(exp_dir, "results_test.json")
            with open(path, "w") as f:
                json.dump(
                    {
                        "results": per_batch,
                        "aggregate": agg,
                        "summary_flat": flat,
                        "summary": aux["results"],
                    },
                    f,
                    indent=1,
                )
        return per_batch
