"""Reference-family convergence CONTROLS (VERDICT r4 directive #1).

Trains the REFERENCE's own implicitron pipelines — GenericModel with
`VoxelGridImplicitFunction` (reference
implicitron/models/implicit_function/voxel_grid_implicit_function.py:40)
and with `SignedDistanceFunctionRenderer` + `IdrFeatureField` (reference
implicitron/models/renderer/sdf_renderer.py:27, ray_tracing.py:14,
implicit_function/idr_feature_field.py:25) — on the SAME synthetic
scenes, ray budget, capacity, optimizer and schedule as our
`train_parity_families` runs, so the voxel/SDF parity claim has a
same-family torch control instead of only the cross-family NeRF one.

The reference stack runs here via benchmarks/ref_implicitron_compat.py
(our plain-dict config machinery + the reference's torch hooks; omegaconf
is unavailable in this environment).

Usage (from /root/repo; scenes from `train_parity gen`):
  python -m benchmarks.train_parity_ref_families ref --family voxel --scene cow
  python -m benchmarks.train_parity_ref_families ref --family sdf --scene spheres

Writes TRAIN_PARITY_ref_{family}_{scene}.json with the same curve /
eval_batch_means shape as the `ours` artifacts.
"""

from __future__ import annotations

import json
import math
import os
import time
from types import SimpleNamespace

import numpy as np

from benchmarks.train_parity_families import (
    DATA_DIR,
    FAMILIES,
    HP,
    SCENES,
    _load_scene,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_ref_model(family: str):
    """Reference GenericModel configured to match our family runs
    capacity-for-capacity (train_parity_families._build_model)."""
    from pytorch3d.implicitron.models.generic_model import GenericModel
    from pytorch3d.implicitron.models.implicit_function.decoding_functions import (
        DecoderActivation,
    )
    from pytorch3d.implicitron.tools.config import expand_args_fields

    expand_args_fields(GenericModel)
    S = HP["image_size"]
    common = dict(
        render_image_width=S,
        render_image_height=S,
        num_passes=1,
        chunk_size_grid=0,
        sampling_mode_training="full_grid",  # same rationale as ours:
        # the synthetic fg masks are binary, mask-sampling never
        # supervises empty space on these scenes
        raysampler_AdaptiveRaySampler_args=dict(
            n_pts_per_ray_training=HP["n_pts"],
            n_pts_per_ray_evaluation=HP["n_pts"],
            n_rays_per_image_sampled_from_mask=HP["n_rays"],
            scene_extent=2.0,
            scene_center=(0.0, 0.0, 0.0),
        ),
        loss_weights={
            "loss_rgb_mse": 1.0,
            "loss_prev_stage_rgb_mse": 1.0,
            # same opacity supervision as the ours arm
            "loss_mask_bce": 1.0,
            "loss_prev_stage_mask_bce": 0.0,
        },
    )
    if family == "voxel":
        # capacity-matched to ours: 48^3 VM grid, 24 components,
        # 27 color features, hidden-32 sigmoid color MLP, dir harmonics 2
        vm = dict(
            voxel_grid_class_type="VMFactorizedVoxelGrid",
            extents=(4.0, 4.0, 4.0),  # ours: [-scene_extent, scene_extent]
            translation=(0.0, 0.0, 0.0),
        )
        return (
            GenericModel(
                implicit_function_class_type="VoxelGridImplicitFunction",
                implicit_function_VoxelGridImplicitFunction_args=dict(
                    voxel_grid_density_args=dict(
                        voxel_grid_VMFactorizedVoxelGrid_args=dict(
                            n_components=24,
                            n_features=1,
                            resolution_changes={0: [48, 48, 48]},
                        ),
                        **vm,
                    ),
                    voxel_grid_color_args=dict(
                        voxel_grid_VMFactorizedVoxelGrid_args=dict(
                            n_components=24,
                            n_features=27,
                            resolution_changes={0: [48, 48, 48]},
                        ),
                        **vm,
                    ),
                    harmonic_embedder_xyz_density_args=dict(
                        n_harmonic_functions=0, append_input=True
                    ),
                    harmonic_embedder_xyz_color_args=dict(
                        n_harmonic_functions=0, append_input=True
                    ),
                    harmonic_embedder_dir_color_args=dict(
                        n_harmonic_functions=2, append_input=True
                    ),
                    # the reference contract: decoders emit RAW density,
                    # the EA raymarcher does the capping
                    decoder_density_class_type="ElementwiseDecoder",
                    decoder_color_class_type="MLPDecoder",
                    decoder_color_MLPDecoder_args=dict(
                        network_args=dict(
                            n_layers=2,
                            hidden_dim=32,
                            output_dim=3,
                            input_skips=(),
                            last_activation=DecoderActivation.SIGMOID,
                            last_layer_bias_init=0.0,
                            use_xavier_init=False,
                        )
                    ),
                    use_multiple_streams=False,  # CPU control
                ),
                **common,
            ),
            5e-3,
        )
    if family == "sdf":
        common["loss_weights"]["loss_eikonal"] = 0.1
        return (
            GenericModel(
                renderer_class_type="SignedDistanceFunctionRenderer",
                renderer_SignedDistanceFunctionRenderer_args=dict(
                    ray_tracer_args=dict(
                        n_steps=24, sphere_tracing_iters=8
                    ),
                    bg_color=(0.0, 0.0, 0.0),  # matches masked-input bg
                    ray_normal_coloring_network_args=dict(
                        dims=(64, 64), n_harmonic_functions_dir=4
                    ),
                ),
                implicit_function_class_type="IdrFeatureField",
                implicit_function_IdrFeatureField_args=dict(
                    dims=(64, 64, 64),
                    skip_in=(2,),
                    n_harmonic_functions_xyz=4,
                ),
                **common,
            ),
            5e-4,
        )
    raise ValueError(family)


def run_ref(family: str, scene: str, steps: int) -> None:
    from benchmarks.ref_implicitron_compat import (
        import_reference_implicitron,
    )

    import_reference_implicitron()

    import torch

    torch.set_num_threads(max(os.cpu_count() - 1, 1))
    torch.manual_seed(1)

    from pytorch3d.implicitron.models.renderer.base import EvaluationMode
    from pytorch3d.renderer import FoVPerspectiveCameras

    d, images, fg, train_idx, test_idx = _load_scene(scene)
    S = HP["image_size"]

    def cam(i):
        return FoVPerspectiveCameras(
            R=torch.tensor(d["R"][i : i + 1]),
            T=torch.tensor(d["T"][i : i + 1]),
            fov=float(d["fov"]),
            znear=float(d["znear"]),
            zfar=float(d["zfar"]),
        )

    model, lr = _build_ref_model(family)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"ref {family} model: {n_params} params", flush=True)
    optimizer = torch.optim.Adam(model.parameters(), lr=lr)
    # same schedule as ours: cosine decay to 1% of peak over `steps`
    sched = torch.optim.lr_scheduler.LambdaLR(
        optimizer,
        lambda it: 0.01
        + 0.99 * 0.5 * (1 + math.cos(math.pi * min(it / steps, 1.0))),
    )

    def render_full(j):
        model.eval()
        with torch.no_grad():
            preds = model(
                image_rgb=torch.tensor(images[j : j + 1]).permute(
                    0, 3, 1, 2
                ),
                camera=cam(j),
                fg_probability=torch.tensor(fg[j : j + 1]).permute(
                    0, 3, 1, 2
                ),
                evaluation_mode=EvaluationMode.EVALUATION,
            )
        img = preds["images_render"]  # (1, 3, H, W)
        mask = preds.get("masks_render")
        depth = preds.get("depths_render")
        return img, mask, depth

    def psnr(pred, gt):
        mse = float(((pred - gt) ** 2).mean())
        return 10.0 * math.log10(1.0 / max(mse, 1e-12))

    rng = np.random.RandomState(7)
    curve = []
    t0 = time.time()
    for it in range(1, steps + 1):
        model.train()
        i = train_idx[rng.randint(len(train_idx))]
        preds = model(
            image_rgb=torch.tensor(images[i : i + 1]).permute(0, 3, 1, 2),
            camera=cam(i),
            fg_probability=torch.tensor(fg[i : i + 1]).permute(0, 3, 1, 2),
            evaluation_mode=EvaluationMode.TRAINING,
        )
        loss = preds["objective"]
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        sched.step()
        if it % HP["eval_every"] == 0 or it == steps:
            psnrs = []
            for j in test_idx:
                img_r, _, _ = render_full(j)
                pred = img_r.permute(0, 2, 3, 1).numpy()
                # masked-gt PSNR, same definition as the ours arm
                psnrs.append(
                    psnr(pred, images[j : j + 1] * fg[j : j + 1])
                )
            curve.append(
                {
                    "step": it,
                    "test_psnr": float(np.mean(psnrs)),
                    "train_loss": float(loss.detach()),
                    "wall_s": time.time() - t0,
                }
            )
            print(json.dumps(curve[-1]), flush=True)

    # final: our eval_batch protocol on each test view (same keys as the
    # `ours` artifacts; renders converted to jnp)
    import jax.numpy as jnp

    from pytorch3d_tpu.implicitron.evaluation.evaluate_new_view_synthesis import (
        eval_batch,
    )
    from pytorch3d_tpu.renderer import (
        FoVPerspectiveCameras as OurFoVPerspectiveCameras,
    )

    eval_rows = []
    for j in test_idx:
        img_r, mask_r, depth_r = render_full(j)
        frame = SimpleNamespace(
            image_rgb=jnp.asarray(images[j : j + 1]),
            fg_probability=jnp.asarray(fg[j : j + 1]),
            depth_map=None,
            camera=OurFoVPerspectiveCameras.create(
                R=jnp.asarray(d["R"][j : j + 1]),
                T=jnp.asarray(d["T"][j : j + 1]),
                fov=float(d["fov"]),
                znear=float(d["znear"]),
                zfar=float(d["zfar"]),
            ),
            frame_type=["test_unseen"],
        )
        render = dict(
            images_render=jnp.asarray(
                img_r.permute(0, 2, 3, 1).numpy()
            ).reshape(1, S, S, 3),
            masks_render=(
                jnp.asarray(mask_r.permute(0, 2, 3, 1).numpy()).reshape(
                    1, S, S, 1
                )
                if mask_r is not None
                else None
            ),
            depths_render=(
                jnp.asarray(depth_r.permute(0, 2, 3, 1).numpy()).reshape(
                    1, S, S, 1
                )
                if depth_r is not None
                else None
            ),
        )
        eval_rows.append(eval_batch(frame, render, bg_color="black"))
    eval_mean = {
        k: float(np.mean([r[k] for r in eval_rows]))
        for k in eval_rows[0]
        if isinstance(eval_rows[0][k], (int, float))
    }
    print("eval_batch means:", json.dumps(eval_mean), flush=True)

    out_path = os.path.join(
        REPO, f"TRAIN_PARITY_ref_{family}_{scene}.json"
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "framework": (
                    f"pytorch3d reference ({family} GenericModel, torch CPU"
                    " via ref_implicitron_compat)"
                ),
                "scene": scene,
                "family": family,
                "n_params": n_params,
                "hp": {k: str(v) for k, v in HP.items()},
                "curve": curve,
                "eval_batch_means": eval_mean,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["ref"])
    ap.add_argument("--family", default="voxel", choices=FAMILIES)
    ap.add_argument("--scene", default="cow", choices=SCENES)
    ap.add_argument("--steps", type=int, default=HP["steps"])
    args = ap.parse_args()
    run_ref(args.family, args.scene, args.steps)
