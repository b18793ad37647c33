"""Train a coarse+fine NeRF.

Parity: reference projects/nerf/train_nerf.py (train/val loop, checkpoint
resume, PSNR eval) — Hydra/visdom replaced by argparse/stdout, the train
step is a jitted sharded function (pytorch3d_tpu.parallel), checkpoints via
orbax.

Run:  PYTHONPATH=. python projects/nerf/train_nerf.py --epochs 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# self-locate the repo root (PYTHONPATH breaks the TPU plugin registration
# in this environment, so the script adds the path itself)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch3d_tpu.implicitron.tools import model_io
from pytorch3d_tpu.implicitron.tools.stats import Stats
from pytorch3d_tpu.models import RadianceFieldRenderer
from pytorch3d_tpu.parallel import get_device_mesh, make_nerf_train_step

from dataset import get_nerf_datasets  # noqa: E402 (sibling module)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="rendered_sphere")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--n_rays", type=int, default=512)
    ap.add_argument("--n_pts", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--exp_dir", default="/tmp/nerf_exp")
    ap.add_argument("--use_mesh", action="store_true",
                    help="shard rays over all local devices")
    ap.add_argument("--bg_white", action="store_true",
                    help="composite empty rays onto white (blender-style)")
    args = ap.parse_args()

    train, val, test = get_nerf_datasets(
        args.dataset, (args.image_size, args.image_size), args.data_root
    )
    print(f"dataset: {len(train)} train / {len(val)} val / {len(test)} test")

    model = RadianceFieldRenderer(
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
    frame0 = train[0]
    key = jax.random.PRNGKey(0)
    params = model.init(
        jax.random.PRNGKey(1), frame0.camera, image=frame0.image, key=key
    )
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    mesh = get_device_mesh() if args.use_mesh else None
    step = make_nerf_train_step(model, optimizer, mesh=mesh)

    @jax.jit
    def val_step(params, camera, image):
        out, m = model.apply(
            params, camera, image=image, training=True,
            key=jax.random.PRNGKey(123),
        )
        return m["psnr_fine"]

    stats = Stats(log_vars=["loss", "psnr_fine", "sec/it"])
    start_epoch = 0
    last = model_io.find_last_checkpoint(args.exp_dir)
    if last is not None:
        params, opt_state, loaded = model_io.load_model(
            last, like={"params": params, "opt_state": opt_state}
        )
        if loaded is not None:
            stats = loaded
        start_epoch = model_io.parse_epoch_from_model_path(last) + 1
        print(f"resumed from {last}")

    for epoch in range(start_epoch, args.epochs):
        stats.new_epoch()
        order = np.random.RandomState(epoch).permutation(len(train))
        for i in order:
            frame = train[int(i)]
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(
                params, opt_state, frame.camera, frame.image, sub
            )
            stats.update(
                {
                    "loss": float(metrics["loss"]),
                    "psnr_fine": float(metrics["psnr_fine"]),
                },
                stat_set="train",
            )
        stats.print(stat_set="train")

        # validation PSNR on held-out views (MC rays for speed)
        psnrs = []
        for frame in val[: min(len(val), 4)]:
            psnrs.append(float(val_step(params, frame.camera, frame.image)))
        print(f"[val] epoch {epoch} psnr_fine {np.mean(psnrs):.2f}")

        model_io.safe_save_model(params, opt_state, stats, args.exp_dir, epoch)
        model_io.purge_epoch(args.exp_dir, epoch - 1)


if __name__ == "__main__":
    main()
