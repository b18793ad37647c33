"""Voxel-family step profile (VERDICT r4 directive #2: the 48^3 VM
voxel step measured ~77 ms/step from curve wall deltas vs 34.6 ms for
the much-heavier fused-MLP NeRF step — find out why and fix it).

Times the full train step and its pieces in isolation on the current
backend. Writes EXP_VOXEL.json rows.

Run: python -m benchmarks.exp_voxel [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _timeit(fn, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main(steps: int) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.train_parity_families import HP, _build_model, _load_scene
    from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode
    from pytorch3d_tpu.renderer import FoVPerspectiveCameras

    d, images, fg, train_idx, test_idx = _load_scene("cow")
    S = HP["image_size"]

    model, lr = _build_model("voxel")
    cam_kwargs = dict(
        fov=float(d["fov"]), znear=float(d["znear"]), zfar=float(d["zfar"])
    )

    def cam(i):
        return FoVPerspectiveCameras.create(
            R=jnp.asarray(d["R"][i : i + 1]),
            T=jnp.asarray(d["T"][i : i + 1]),
            **cam_kwargs,
        )

    img0 = jnp.asarray(images[0:1])
    fg0 = jnp.asarray(fg[0:1])
    params = model.init(
        jax.random.PRNGKey(1),
        key=jax.random.PRNGKey(2),
        evaluation_mode=EvaluationMode.TRAINING,
        image_rgb=img0,
        camera=cam(0),
        fg_probability=fg0,
    )
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    R0 = jnp.asarray(d["R"][0:1])
    T0 = jnp.asarray(d["T"][0:1])

    @jax.jit
    def fwd(params, R, T, key):
        cams = FoVPerspectiveCameras.create(R=R, T=T, **cam_kwargs)
        preds = model.apply(
            params,
            image_rgb=img0,
            camera=cams,
            fg_probability=fg0,
            evaluation_mode=EvaluationMode.TRAINING,
            key=key,
        )
        return preds["objective"]

    @jax.jit
    def step(params, opt_state, R, T, key):
        def loss_fn(p):
            return fwd.__wrapped__(p, R, T, key)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def render_full(params, R, T):
        cams = FoVPerspectiveCameras.create(R=R, T=T, **cam_kwargs)
        preds = model.apply(
            params,
            image_rgb=None,
            camera=cams,
            fg_probability=None,
            evaluation_mode=EvaluationMode.EVALUATION,
            key=jax.random.PRNGKey(0),
        )
        return preds["images_render"]

    key = jax.random.PRNGKey(3)
    rows = {}
    rows["fwd_ms"] = _timeit(lambda: fwd(params, R0, T0, key), iters=steps)
    # full step (state update consumed each call like training would)
    rows["step_ms"] = _timeit(
        lambda: step(params, opt_state, R0, T0, key)[2], iters=steps
    )
    rows["render_full_ms"] = _timeit(
        lambda: render_full(params, R0, T0), iters=max(steps // 4, 5)
    )

    # implicit function alone on the training-shaped point cloud
    from pytorch3d_tpu.implicitron.models.renderer.base import (
        ImplicitronRayBundle,
    )

    n_rays, n_pts = HP["n_rays"], HP["n_pts"]
    key_o = jax.random.PRNGKey(9)
    origins = jax.random.normal(key_o, (1, n_rays, 3)) * 0.1 + jnp.array(
        [0.0, 0.0, -2.7]
    )
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (1, n_rays, 3))
    lengths = jnp.broadcast_to(
        jnp.linspace(1.0, 4.5, n_pts), (1, n_rays, n_pts)
    )
    bundle = ImplicitronRayBundle(
        origins=origins,
        directions=dirs,
        lengths=lengths,
        xys=jnp.zeros((1, n_rays, 2)),
    )

    @jax.jit
    def if_fwd(params):
        def run(m):
            return m._implicit_functions[0](bundle)

        return model.apply(params, method=run)

    @jax.jit
    def if_grad(params):
        def run(m):
            dens, cols = m._implicit_functions[0](bundle)
            return jnp.sum(dens) + jnp.sum(cols)

        return jax.grad(lambda p: model.apply(p, method=run))(params)

    rows["implicit_fn_fwd_ms"] = _timeit(lambda: if_fwd(params), iters=steps)
    rows["implicit_fn_grad_ms"] = _timeit(
        lambda: if_grad(params), iters=steps
    )

    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "hp": {k: str(v) for k, v in HP.items()},
        "rows_ms": rows,
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "EXP_VOXEL.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    main(args.steps)
