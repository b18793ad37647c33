"""End-to-end training with VoxelGridImplicitFunction epoch machinery:
resolution changes, scaffold computation, and volume cropping inside the
implicitron training loop (reference voxel_grid_implicit_function.py
`subscribe_to_epochs` wiring through impl/training_loop.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from projects.implicitron_trainer.experiment import Experiment  # noqa: E402
from pytorch3d_tpu.implicitron.tools.config import (  # noqa: E402
    get_default_args,
)


def _experiment(tmp_path, **fn_args):
    get_default_args(Experiment)  # expand *_args fields
    return Experiment(
        exp_dir=str(tmp_path),
        resume=False,
        model_args=dict(
            render_image_width=16,
            render_image_height=16,
            num_passes=1,
            chunk_size_grid=512,
            raysampler_args=dict(
                n_pts_per_ray_training=4,
                n_pts_per_ray_evaluation=4,
                n_rays_per_image_sampled_from_mask=16,
                scene_extent=3.0,
            ),
            implicit_function_class_type="VoxelGridImplicitFunction",
            implicit_function_args=dict(
                grid_type="vm",
                resolution=(8, 8, 8),
                n_components=6,
                n_features_color=9,
                n_hidden_color=8,
                scene_extent=3.0,
                **fn_args,
            ),
        ),
        dataset_args=dict(num_views=3, resolution=16),
        optimizer_factory_args=dict(breed="Adam", lr=5e-3),
        training_loop_args=dict(max_epochs=4, store_checkpoints=False),
    )


class TestVoxelGridTraining:
    def test_resolution_change_mid_training(self, tmp_path):
        exp = _experiment(
            tmp_path,
            voxel_grid_density_args={
                "voxel_grid_class_type": "FullResolutionVoxelGrid",
                "voxel_grid_args": {
                    "n_features": 1,
                    "resolution_changes": {0: [8, 8, 8], 2: [12, 12, 12]},
                },
                "extents": (6.0, 6.0, 6.0),
            },
        )
        variables, _ = exp.run()
        grid = variables["params"]["implicit_function_0"][
            "voxel_grid_density"
        ]["voxel_grid"]
        assert grid.shape == (1, 1, 12, 12, 12)
        assert np.isfinite(np.asarray(grid)).all()

    def test_scaffold_and_crop_epochs(self, tmp_path):
        exp = _experiment(
            tmp_path,
            scaffold_calculating_epochs=(1,),
            volume_cropping_epochs=(2,),
            scaffold_resolution=(8, 8, 8),
            scaffold_empty_space_threshold=0.0,  # everything occupied
        )
        variables, _ = exp.run()
        buffers = variables["buffers"]["implicit_function_0"]
        assert float(buffers["scaffold_ready"]) == 1.0
        occ = np.asarray(buffers["voxel_grid_scaffold"]["voxel_grid"])
        assert occ.shape == (1, 1, 8, 8, 8)
        assert occ.max() == 1.0  # threshold 0 with >=0 densities
        # cropping ran: extents buffers exist and are finite
        ext = np.asarray(buffers["voxel_grid_density"]["extents"])
        assert np.isfinite(ext).all() and (ext > 0).all()


class TestVisualizeReconstruction:
    """visualize_reconstruction loads the dumped expconfig + checkpoint
    and writes a fly-around video (reference
    projects/implicitron_trainer/visualize_reconstruction.py:31)."""

    def test_end_to_end(self, tmp_path):
        from projects.implicitron_trainer.experiment import Experiment
        from projects.implicitron_trainer.visualize_reconstruction import (
            visualize_reconstruction,
        )

        get_default_args(Experiment)
        exp = Experiment(
            exp_dir=str(tmp_path),
            resume=False,
            model_args=dict(
                render_image_width=8,
                render_image_height=8,
                num_passes=1,
                chunk_size_grid=256,
                raysampler_args=dict(
                    n_pts_per_ray_training=4,
                    n_pts_per_ray_evaluation=4,
                    n_rays_per_image_sampled_from_mask=8,
                    scene_extent=3.0,
                ),
                implicit_function_args=dict(
                    n_hidden_neurons_xyz=8,
                    n_hidden_neurons_dir=8,
                    n_layers_xyz=2,
                    append_xyz=(1,),
                ),
            ),
            dataset_args=dict(num_views=3, resolution=8),
            training_loop_args=dict(max_epochs=1, store_checkpoints=True),
        )
        exp.run()
        assert os.path.isfile(os.path.join(str(tmp_path), "expconfig.yaml"))
        paths = visualize_reconstruction(
            exp_dir=str(tmp_path),
            render_size=(8, 8),
            n_eval_cameras=3,
            split="train",
            fps=2,
        )
        assert len(paths) >= 1
        for p in paths:
            assert os.path.isfile(p) and os.path.getsize(p) > 0
