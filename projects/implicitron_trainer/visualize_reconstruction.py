"""Visualize a trained implicitron experiment as fly-around videos.

Parity: reference projects/implicitron_trainer/visualize_reconstruction.py
(`visualize_reconstruction` :31, `main` :152): loads the experiment
config + last checkpoint from `exp_dir`, rebuilds the dataset and model,
and calls `render_flyaround` for each requested sequence of the chosen
split, writing videos to `<exp_dir>/vis` (or `output_directory`).

Usage:
    python -m projects.implicitron_trainer.visualize_reconstruction \
        exp_dir=<checkpoint dir> split=train n_eval_cameras=40
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np


def _build_datasets(cfg):
    """Rebuild the dataset map the way Experiment.run does."""
    if cfg.get("data_source_args"):
        from pytorch3d_tpu.implicitron.dataset.data_source import (
            ImplicitronDataSource,
        )

        source = ImplicitronDataSource(**cfg["data_source_args"])
        datasets, _ = source.get_datasets_and_dataloaders()
        return datasets
    from pytorch3d_tpu.implicitron.dataset.rendered_mesh_dataset_map_provider import (  # noqa: E501
        RenderedMeshDatasetMapProvider,
    )

    provider = RenderedMeshDatasetMapProvider(**(cfg.get("dataset_args") or {}))
    return provider.get_dataset_map()


def visualize_reconstruction(
    exp_dir: str = "",
    restrict_sequence_name: Optional[str] = None,
    output_directory: Optional[str] = None,
    render_size: Tuple[int, int] = (512, 512),
    split: str = "train",
    n_eval_cameras: int = 40,
    visualize_preds_keys=("images_render",),
    **render_flyaround_kwargs,
):
    """Render fly-around videos of every (or one restricted) sequence in
    `split` using the last checkpoint in `exp_dir`. Returns the list of
    written video paths (reference visualize_reconstruction.py:31; the
    visdom options of the reference are host-display-only and omitted —
    videos are always written to disk)."""
    import jax

    from pytorch3d_tpu.implicitron.models.generic_model import GenericModel
    from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode
    from pytorch3d_tpu.implicitron.models.visualization.render_flyaround import (  # noqa: E501
        render_flyaround,
    )
    from pytorch3d_tpu.implicitron.tools import model_io

    from .experiment import load_config

    if output_directory is None:
        output_directory = os.path.join(exp_dir, "vis")
    os.makedirs(output_directory, exist_ok=True)

    cfg = None
    for name in ("expconfig.yaml", "config.yaml"):
        cfg_path = os.path.join(exp_dir, name)
        if os.path.isfile(cfg_path):
            cfg = load_config(cfg_path)
            break
    if cfg is None:
        raise FileNotFoundError(
            f"No expconfig.yaml in {exp_dir} — pass an experiment "
            "directory written by the trainer (reference :145 loads "
            "expconfig.yaml the same way)."
        )

    datasets = _build_datasets(cfg)
    if split not in datasets:
        raise ValueError(
            f"split {split!r} not in dataset map {sorted(datasets)}"
        )
    dataset = datasets[split]

    model_args = dict(cfg.get("model_args") or {})
    model_args["render_image_width"] = render_size[1]
    model_args["render_image_height"] = render_size[0]
    model = GenericModel(**model_args)

    last = model_io.find_last_checkpoint(exp_dir)
    if last is None:
        raise FileNotFoundError(f"No checkpoint found in {exp_dir}")
    params, _, _ = model_io.load_model(last)

    # sequences to render
    if restrict_sequence_name is not None:
        seq_names = [restrict_sequence_name]
    elif hasattr(dataset, "sequence_names"):
        seq_names = list(dataset.sequence_names())
    else:
        seq_names = [None]

    paths = []
    for seq in seq_names:
        tag = seq if seq is not None else "scene"
        out_path = os.path.join(
            output_directory, f"{split}_{tag}.gif"
        )
        path = render_flyaround(
            dataset,
            seq,
            model,
            params,
            out_path,
            n_flyaround_poses=n_eval_cameras,
            visualize_preds_keys=visualize_preds_keys,
            **render_flyaround_kwargs,
        )
        print(f"[visualize] wrote {path}", flush=True)
        paths.append(path)
    return paths


def main(argv=None) -> None:
    """CLI: key=value overrides, e.g.
    `python -m ...visualize_reconstruction exp_dir=/tmp/exp split=train`
    (reference :152)."""
    argv = sys.argv[1:] if argv is None else argv
    kwargs = {}
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"Arguments must be key=value; got {arg!r}")
        k, v = arg.split("=", 1)
        try:
            import ast

            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        kwargs[k] = v
    visualize_reconstruction(**kwargs)


if __name__ == "__main__":
    main()
