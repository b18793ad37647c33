"""Evaluate or export a video from a trained NeRF checkpoint.

Parity: reference projects/nerf/test_nerf.py (`main` :26): two modes —
  evaluation: full-image PSNR/MSE over the test split;
  export_video: render a circular camera trajectory fit to the train
  cameras and write a video (reference eval_video_utils ->
  implicitron/tools/eval_video_trajectory here).

Run:  python projects/nerf/test_nerf.py --exp_dir /tmp/nerf_exp \
          --mode evaluation --image_size 64
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

import jax
import numpy as np

from pytorch3d_tpu.implicitron.tools import model_io
from pytorch3d_tpu.implicitron.tools.eval_video_trajectory import (
    generate_eval_video_cameras,
)
from pytorch3d_tpu.implicitron.tools.stats import Stats
from pytorch3d_tpu.implicitron.tools.video_writer import VideoWriter
from pytorch3d_tpu.models import RadianceFieldRenderer
from pytorch3d_tpu.renderer.camera_utils import join_cameras_as_batch

from dataset import get_nerf_datasets  # noqa: E402 (sibling module)


def build_model(args) -> RadianceFieldRenderer:
    return RadianceFieldRenderer(
        image_width=args.image_size,
        image_height=args.image_size,
        n_pts_per_ray=args.n_pts,
        n_pts_per_ray_fine=args.n_pts,
        n_rays_per_image=args.n_rays,
        min_depth=0.5,
        max_depth=6.0,
        n_hidden_neurons_xyz=args.hidden,
        n_hidden_neurons_dir=args.hidden // 2,
        n_layers_xyz=args.layers,
        append_xyz=(args.layers // 2,),
        bg_color=(1.0, 1.0, 1.0) if args.bg_white else (0.0, 0.0, 0.0),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp_dir", default="/tmp/nerf_exp")
    ap.add_argument(
        "--mode", choices=["evaluation", "export_video"], default="evaluation"
    )
    ap.add_argument("--dataset", default="rendered_sphere")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--n_rays", type=int, default=512)
    ap.add_argument("--n_pts", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--bg_white", action="store_true")
    ap.add_argument("--max_frames", type=int, default=0)
    # export_video options (reference configs test: section)
    ap.add_argument("--trajectory_type", default="circular_lsq_fit")
    ap.add_argument("--trajectory_scale", type=float, default=1.1)
    ap.add_argument("--n_frames", type=int, default=40)
    ap.add_argument("--fps", type=int, default=20)
    args = ap.parse_args()

    train, val, test = get_nerf_datasets(
        args.dataset, (args.image_size, args.image_size), args.data_root
    )
    model = build_model(args)
    frame0 = train[0]
    params = model.init(
        jax.random.PRNGKey(1),
        frame0.camera,
        image=frame0.image,
        key=jax.random.PRNGKey(0),
    )

    last = model_io.find_last_checkpoint(args.exp_dir)
    if last is None:
        raise ValueError(f"No checkpoint found in {args.exp_dir}!")
    print(f"Loading checkpoint {last}.")
    # bare restore (nested dicts) — apply() accepts plain dicts, and the
    # optimizer state is not needed for inference
    params, _, _ = model_io.load_model(last)

    @jax.jit
    def render_full(params, camera, image):
        out, metrics = model.apply(
            params, camera, image=image, training=False,
            key=jax.random.PRNGKey(3),
        )
        return out["rgb_fine"], metrics

    if args.mode == "evaluation":
        stats = Stats(
            log_vars=["mse_coarse", "mse_fine", "psnr_coarse", "psnr_fine",
                      "sec/it"]
        )
        stats.new_epoch()
        frames = test[: args.max_frames] if args.max_frames else test
        for frame in frames:
            _, metrics = render_full(params, frame.camera, frame.image)
            stats.update(
                {k: float(v) for k, v in metrics.items()}, stat_set="test"
            )
        stats.print(stat_set="test")
        return {
            k: m.avg for k, m in stats.stats["test"].items()
        }

    # export_video: circular trajectory fit to the train cameras
    cams = join_cameras_as_batch([f.camera for f in train])
    traj = generate_eval_video_cameras(
        cams,
        n_eval_cams=args.n_frames,
        trajectory_type=args.trajectory_type,
        trajectory_scale=args.trajectory_scale,
    )
    export_dir = os.path.join(args.exp_dir, "video")
    os.makedirs(export_dir, exist_ok=True)
    out_path = os.path.join(export_dir, "video.gif")
    writer = VideoWriter(fps=args.fps, out_path=out_path)
    dummy = frame0.image
    for i in range(args.n_frames):
        cam_i = jax.tree_util.tree_map(
            lambda x: x[i : i + 1]
            if hasattr(x, "ndim") and x.ndim > 0 and x.shape[0] == args.n_frames
            else x,
            traj,
        )
        rgb, _ = render_full(params, cam_i, dummy)
        writer.write_frame(np.asarray(rgb.reshape(args.image_size, args.image_size, 3)))
    path = writer.get_video()
    print(f"Wrote {path}")
    return path


if __name__ == "__main__":
    main()
