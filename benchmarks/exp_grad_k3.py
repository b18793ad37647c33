"""A/B experiments for the 1024² K=3 blur=0 backward gap (VERDICT r3 #5).

Times the end-to-end fwd+bwd at the hard-raster settings
(faces_per_pixel=3, blur_radius=0 — what MeshRasterizerOpenGL-class
users run) for ico4/5/6 at 1024², under the grad-kernel variants:
  * baseline (current kernel)
  * P3D_GRAD_SKIP=1 — skip the per-face AD chain when no pixel selected
    the face
  * P3D_RASTER_UNROLL=8 — deeper latency-chain overlap

Each variant runs in a SUBPROCESS (the flags are read at import).
Writes EXP_GRAD_K3.json.  Usage (real TPU): python -m benchmarks.exp_grad_k3
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = """
import json, sys
import jax, jax.numpy as jnp
from benchmarks.runner import time_fn
from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras, MeshRasterizer, RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh import rasterize_pallas as rp
from pytorch3d_tpu.utils import ico_sphere

level = int(sys.argv[1])
SIZE = 1024
K = 3

mesh = ico_sphere(level)
R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=30.0)
cams = FoVPerspectiveCameras.create(R=R, T=T)
rast = MeshRasterizer(cams, RasterizationSettings(image_size=SIZE))
tm = rast.transform(mesh)
fv = tm.verts_padded()[0][tm.faces_padded()[0]]
valid = tm.faces_padded()[0, :, 0] >= 0

def loss(f):
    pix, zb, ba, di = rp.rasterize_fragments_pallas(
        f, valid, (SIZE, SIZE), 0.0, K, perspective_correct=True,
    )
    return jnp.sum(jnp.where(jnp.isfinite(zb), zb, 0.0)) * 1e-6 + jnp.sum(ba) * 1e-6

g = jax.jit(jax.value_and_grad(loss))
fwd = jax.jit(loss)
dt_f = time_fn(lambda: fwd(fv), warmup=2, iters=10)
dt_fb = time_fn(lambda: g(fv), warmup=2, iters=10)
print(json.dumps({
    "level": level, "fwd_ms": round(dt_f * 1e3, 3),
    "fwd_bwd_ms": round(dt_fb * 1e3, 3),
    "bwd_only_ms": round((dt_fb - dt_f) * 1e3, 3),
}), flush=True)
"""


def run(level: int, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(level)],
        capture_output=True, text=True, env=env, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"level": level, "error": out.stderr[-400:]}
    return json.loads(lines[-1])


def main() -> None:
    variants = {
        "baseline": {},
        "grad_skip": {"P3D_GRAD_SKIP": "1"},
        "unroll8": {"P3D_RASTER_UNROLL": "8"},
        "skip_unroll8": {"P3D_GRAD_SKIP": "1", "P3D_RASTER_UNROLL": "8"},
    }
    results = {}
    for name, env in variants.items():
        rows = []
        for level in (4, 5, 6):
            row = run(level, env)
            row["variant"] = name
            rows.append(row)
            print(json.dumps(row), flush=True)
        results[name] = rows
    with open("EXP_GRAD_K3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote EXP_GRAD_K3.json")


if __name__ == "__main__":
    main()
