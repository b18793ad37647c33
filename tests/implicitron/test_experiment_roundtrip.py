"""Full experiment.py train-loop round-trips per model family
(VERDICT r4 directive #8; models the reference's
projects/implicitron_trainer/tests/test_experiment.py): each family
trains a few epochs end-to-end on the in-process rendered provider,
writes checkpoints, and RESUMES from them."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from projects.implicitron_trainer.experiment import Experiment  # noqa: E402
from pytorch3d_tpu.implicitron.tools.config import (  # noqa: E402
    expand_args_fields,
)

expand_args_fields(Experiment)

_TINY_DATASET = dict(num_views=6, resolution=32)


def _model_args(family: str):
    common = dict(
        render_image_width=32,
        render_image_height=32,
        num_passes=1,
        chunk_size_grid=0,
        raysampler_args=dict(
            n_pts_per_ray_training=12,
            n_pts_per_ray_evaluation=12,
            n_rays_per_image_sampled_from_mask=128,
            scene_extent=2.0,
        ),
    )
    if family == "nerf":
        return dict(
            implicit_function_args=dict(
                n_harmonic_functions_xyz=4,
                n_harmonic_functions_dir=2,
                n_hidden_neurons_xyz=32,
                n_hidden_neurons_dir=16,
                n_layers_xyz=2,
                append_xyz=(),
            ),
            **common,
        )
    if family == "voxel":
        return dict(
            implicit_function_class_type="VoxelGridImplicitFunction",
            implicit_function_args=dict(
                grid_type="vm",
                resolution=(12, 12, 12),
                n_components=6,
                n_features_color=9,
                n_hidden_color=16,
                scene_extent=2.0,
                density_activation="identity",
            ),
            **common,
        )
    if family == "sdf":
        return dict(
            renderer_class_type="SignedDistanceFunctionRenderer",
            renderer_args=dict(
                ray_tracer_args=dict(n_steps=12, sphere_tracing_iters=4),
                ray_normal_coloring_network_args=dict(
                    dims=(16,), n_harmonic_functions_dir=2
                ),
            ),
            implicit_function_class_type="IdrFeatureField",
            implicit_function_args=dict(
                dims=(16, 16),
                skip_in=(),
                n_harmonic_functions_xyz=2,
            ),
            loss_weights={
                "loss_rgb_mse": 1.0,
                "loss_mask_bce": 1.0,
                "loss_eikonal": 0.1,
            },
            **common,
        )
    raise ValueError(family)


@pytest.mark.parametrize("family", ["nerf", "voxel", "sdf"])
def test_experiment_trains_and_resumes(family, tmp_path):
    exp_dir = str(tmp_path / family)
    exp = Experiment(
        exp_dir=exp_dir,
        resume=False,
        model_args=_model_args(family),
        dataset_args=dict(_TINY_DATASET),
        optimizer_factory_args=dict(lr=5e-3, lr_policy="MultiStepLR"),
        training_loop_args=dict(
            max_epochs=2,
            store_checkpoints=True,
            validation_interval=1,
        ),
    )
    exp.run()

    # the run checkpointed stats with a finite, non-exploding objective
    from projects.implicitron_trainer.experiment import (
        ImplicitronTrainingLoop,
    )

    stats = ImplicitronTrainingLoop.load_stats(
        ["objective"], exp_dir, resume=True
    )
    hist = stats.stats["train"]["objective"].get_epoch_averages()
    assert len(hist) == 2, hist
    assert np.isfinite(hist[-1])
    assert hist[-1] < hist[0] * 1.05, hist  # usually falls

    # a checkpoint and the config dump exist
    from pytorch3d_tpu.implicitron.tools import model_io

    last = model_io.find_last_checkpoint(exp_dir)
    assert last is not None
    assert os.path.exists(os.path.join(exp_dir, "expconfig.yaml"))

    # resume: a fresh Experiment picks up the checkpoint and continues
    exp2 = Experiment(
        exp_dir=exp_dir,
        resume=True,
        model_args=_model_args(family),
        dataset_args=dict(_TINY_DATASET),
        optimizer_factory_args=dict(lr=5e-3, lr_policy="MultiStepLR"),
        training_loop_args=dict(
            max_epochs=3,
            store_checkpoints=True,
            validation_interval=-1,
        ),
    )
    exp2.run()
    # continued, not restarted: epochs accumulate past the first run
    stats2 = ImplicitronTrainingLoop.load_stats(
        ["objective"], exp_dir, resume=True
    )
    assert stats2.epoch >= 2
    assert len(stats2.stats["train"]["objective"].history) >= 3
