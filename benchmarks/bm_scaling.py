"""Scaling-efficiency harness for the shard_map paths (SURVEY §2.12).

Measures rays/s of the shard_map GenericModel train step and Mpix/s of
the pixel-sharded rasterizer at mesh sizes 1/2/4/8, writing SCALING.json
with per-size rates and efficiency vs linear scaling from 1 device.

On this 1-real-chip environment the sizes run as VIRTUAL CPU devices
(subprocess per size with xla_force_host_platform_device_count), which
validates the collective structure and measures collective overhead —
virtual devices share host cores, so absolute efficiency numbers are a
LOWER BOUND on real-pod ICI scaling (BASELINE target >=85% at 4 hosts is
to be confirmed on a pod).  On a real multi-chip slice the same harness
runs unmodified.

Run: python -m benchmarks.bm_scaling
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

CHILD_TIMEOUT_S = 900.0

_CHILD = """
import json, os, sys, time
import jax, jax.numpy as jnp
import optax

n = int(sys.argv[1])
from pytorch3d_tpu.parallel import (
    get_device_mesh, make_sharded_generic_train_step,
)
from pytorch3d_tpu.parallel.raster import sharded_silhouette_loss_and_grad
from pytorch3d_tpu.implicitron.models.generic_model import GenericModel
from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode
from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras, MeshRasterizer, RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.utils import ico_sphere

mesh = get_device_mesh((1, n))
N_RAYS = 128  # per device -> total rays scales with n

model = GenericModel(
    render_image_width=32, render_image_height=32, num_passes=1,
    chunk_size_grid=0,
    raysampler_args=dict(
        n_pts_per_ray_training=16, n_pts_per_ray_evaluation=16,
        n_rays_per_image_sampled_from_mask=N_RAYS, scene_extent=3.0,
    ),
    implicit_function_args=dict(
        n_hidden_neurons_xyz=64, n_hidden_neurons_dir=32,
        n_layers_xyz=4, append_xyz=(2,),
    ),
)
R, T = look_at_view_transform(dist=2.7, elev=10.0, azim=30.0)
cams = FoVPerspectiveCameras.create(R=R, T=T)
img = jnp.broadcast_to(jnp.asarray([0.3, 0.6, 0.2]), (1, 32, 32, 3))
fg = jnp.ones((1, 32, 32, 1))
batch = dict(image_rgb=img, camera=cams, fg_probability=fg)
params = model.init(
    jax.random.PRNGKey(0), key=jax.random.PRNGKey(2),
    evaluation_mode=EvaluationMode.TRAINING, **batch
)
opt = optax.adam(1e-3)
opt_state = opt.init(params)
step = make_sharded_generic_train_step(
    model, opt, mesh,
    static_model_kwargs=dict(evaluation_mode=EvaluationMode.TRAINING),
)
for i in range(3):  # warmup (compile + thread-pool spin-up)
    params, opt_state, loss = step(
        params, opt_state, batch, jax.random.PRNGKey(i)
    )
jax.block_until_ready(loss)
dts = []
for rep in range(3):
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
    jax.block_until_ready(loss)
    dts.append((time.perf_counter() - t0) / iters)
dt = sorted(dts)[1]  # median of 3 repeats
rays_per_s = N_RAYS * n / dt

# sharded raster fwd+bwd
sphere = ico_sphere(2)
rast = MeshRasterizer(cams, RasterizationSettings(image_size=64))
tm = rast.transform(sphere)
fv = tm.verts_padded()[0][tm.faces_padded()[0]]
valid = tm.faces_padded()[0, :, 0] >= 0
f = jax.jit(lambda v: sharded_silhouette_loss_and_grad(
    v, valid, (64, 64), mesh))
for _ in range(3):
    out = f(fv)
jax.block_until_ready(out)
rts = []
for rep in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(fv)
    jax.block_until_ready(out)
    rts.append((time.perf_counter() - t0) / 10 * 1e3)
raster_ms = sorted(rts)[1]

print(json.dumps({
    "n": n, "rays_per_s": rays_per_s, "step_ms": dt * 1e3,
    "raster_fwdbwd_ms": raster_ms,
}))
"""


def _physical_cores() -> "list[int]":
    """One logical CPU per physical core (lowest sibling), so core-scaled
    pinning is not skewed by SMT sibling threads sharing an execution core
    (advisor r3).  Falls back to all logical CPUs if sysfs is absent."""
    seen = {}
    for path in sorted(glob.glob("/sys/devices/system/cpu/cpu[0-9]*")):
        cpu = int(os.path.basename(path)[3:])
        try:
            with open(os.path.join(path, "topology/core_id")) as f:
                core = int(f.read())
            with open(
                os.path.join(path, "topology/physical_package_id")
            ) as f:
                pkg = int(f.read())
        except OSError:
            continue
        seen.setdefault((pkg, core), cpu)
    if seen:
        return sorted(seen.values())
    return list(range(os.cpu_count() or 1))


def _run_child(n: int, cores: "list[int] | None"):
    """Run one mesh size in a subprocess; optionally pin it to `cores`."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    )
    env.pop("PYTHONPATH", None)
    cmd = [sys.executable, "-c", _CHILD, str(n)]
    if cores is not None:
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", ",".join(map(str, cores))] + cmd
        else:  # no taskset (macOS/minimal images): run unpinned
            print(f"n={n}: taskset unavailable, running unpinned",
                  flush=True)
            cores = None
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, env=env,
            timeout=CHILD_TIMEOUT_S,
            cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        )
    except subprocess.TimeoutExpired:
        print(f"n={n} cores={cores} FAILED: timeout>{CHILD_TIMEOUT_S}s")
        return None
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(f"n={n} cores={cores} FAILED:\n{out.stderr[-2000:]}")
        return None
    row = json.loads(line[-1])
    print(json.dumps(row), flush=True)
    return row


def main():
    phys = _physical_cores()
    ncores = len(phys)

    # Mode 1 (calibrated): n host cores for n devices, so per-device
    # resources are constant across sizes and efficiency-vs-linear is
    # meaningful (a lower bound: the shards still share caches/memory BW
    # and pay real collective cost).  Only sizes with enough host cores.
    core_scaled = []
    for n in [1, 2, 4, 8]:
        if n > ncores:
            break
        row = _run_child(n, cores=phys[:n])
        if row:
            core_scaled.append(row)
    if core_scaled and core_scaled[0]["n"] == 1:
        base = core_scaled[0]["rays_per_s"]
        for r in core_scaled:
            r["efficiency_vs_linear"] = r["rays_per_s"] / (base * r["n"])

    # Mode 2 (structure-validating): every size gets the whole machine.
    # With n devices sharing a fixed pool, per-device resources FALL with
    # n, so "efficiency" is not well-defined here (a single XLA CPU device
    # also underuses the pool, which made the old n=1 baseline read
    # superlinear at n=2).  Raw rates only; oversubscribed sizes flagged.
    shared_pool = []
    for n in [1, 2, 4, 8]:
        row = _run_child(n, cores=None)
        if row:
            row["oversubscribed"] = n > ncores
            shared_pool.append(row)

    with open("SCALING.json", "w") as f:
        json.dump(
            {
                "note": (
                    "virtual CPU devices: core_scaled pins n cores to n"
                    " devices (constant per-device resources; efficiency"
                    " meaningful as a lower bound), shared_pool gives every"
                    " size the whole host (raw rates only; efficiency"
                    " undefined, n>ncores oversubscribed). Neither is"
                    " ICI-representative; on a real pod this harness runs"
                    " unmodified. Pinning uses one logical CPU per"
                    " PHYSICAL core (SMT siblings excluded)."
                ),
                "host_physical_cores": ncores,
                "host_logical_cpus": os.cpu_count(),
                "core_scaled": core_scaled,
                "shared_pool": shared_pool,
            },
            f,
            indent=1,
        )
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
