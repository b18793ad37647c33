"""Evaluate a depth-based image rendering (DBIR) baseline on a dataset.

Parity: reference pytorch3d/implicitron/eval_demo.py (`Task` :51,
`evaluate_dbir_for_category` :82, `main` :44): the non-learned
evaluation entry — re-render source RGBD frames into each eval target
view with `ModelDBIR` and score with the new-view-synthesis protocol.

The reference hard-requires the CO3D download; here the data source is
configured by arguments (any of our dataset providers work) so the demo
is runnable on the in-process rendered dataset too.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


class Task(enum.Enum):
    SINGLE_SEQUENCE = "singlesequence"
    MULTI_SEQUENCE = "multisequence"


def evaluate_dbir_for_category(
    category: str = "",
    task: Task = Task.SINGLE_SEQUENCE,
    bg_color: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    single_sequence_id: Optional[int] = None,
    num_workers: int = 0,
    data_source_args: Optional[Dict[str, Any]] = None,
    max_batches: int = 0,
) -> Dict[str, Any]:
    """Run the DBIR baseline over a test split and aggregate the NVS
    metrics (reference eval_demo.py:82). `data_source_args` selects the
    dataset (the reference hardcodes CO3D's JsonIndexDatasetMapProvider;
    pass the analogous provider args here, e.g.
    ``{"dataset_map_provider_class_type": "JsonIndexDatasetMapProviderV2",
    "dataset_map_provider_args": {"category": ..., "dataset_root": ...}}``).
    Returns the aggregated category result dict."""
    from .dataset.data_source import ImplicitronDataSource
    from .evaluation.evaluate_new_view_synthesis import (
        aggregate_nvs_results,
        eval_batch,
    )
    from .models.overfit_model import ModelDBIR

    if data_source_args is None:
        import os

        root = os.environ.get("CO3D_DATASET_ROOT", "")
        data_source_args = {
            "dataset_map_provider_class_type": "JsonIndexDatasetMapProviderV2",
            "dataset_map_provider_args": {
                "category": category,
                "dataset_root": root,
                "test_on_train": False,
            },
        }
    source = ImplicitronDataSource(**data_source_args)
    datasets, dataloaders = source.get_datasets_and_dataloaders()
    test_dataset = datasets["test"]
    test_loader = dataloaders["test"] if dataloaders is not None else None
    if test_dataset is None:
        raise ValueError("must have a test dataset.")
    if test_loader is None:
        from .dataset.data_loader_map_provider import _Loader

        test_loader = _Loader(
            test_dataset,
            [[i] for i in range(len(test_dataset))],
            num_workers=num_workers,
        )

    frame0 = test_dataset[0]
    H, W = frame0.image_rgb.shape[1:3]
    model = ModelDBIR(
        render_image_width=W,
        render_image_height=H,
        bg_color=bg_color[0] if isinstance(bg_color, tuple) else bg_color,
        max_points=int(1e5),
    )

    per_batch = []
    for bi, frame_data in enumerate(test_loader):
        if max_batches and bi >= max_batches:
            break
        if frame_data.depth_map is None:
            raise ValueError(
                "DBIR evaluation needs depth maps in the dataset."
            )
        preds = model(
            camera=frame_data.camera,
            image_rgb=frame_data.image_rgb,
            depth_map=frame_data.depth_map,
            fg_probability=frame_data.fg_probability,
        )
        nvs = eval_batch(
            frame_data,
            preds["implicitron_render"],
            bg_color=bg_color,
        )
        per_batch.append(nvs)

    return aggregate_nvs_results(per_batch)


def main(argv=None) -> None:
    """CLI: key=value overrides, e.g.
    ``python -m pytorch3d_tpu.implicitron.eval_demo category=apple``
    (reference eval_demo.py:44)."""
    import ast
    import json
    import sys

    argv = sys.argv[1:] if argv is None else argv
    kwargs: Dict[str, Any] = {}
    for arg in argv:
        k, v = arg.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        kwargs[k] = v
    if "task" in kwargs:
        kwargs["task"] = Task(kwargs["task"])
    result = evaluate_dbir_for_category(**kwargs)
    print(json.dumps(result, indent=2, default=float))


if __name__ == "__main__":
    main()
