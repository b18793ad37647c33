"""Small-mesh / large-image regime (VERDICT r4 directive #7): ico0-ico2
at 512^2/1024^2 sit at frac 0.2-0.43 — the many-tiles-few-faces corner
is launch/dispatch bound (hundreds of Pallas programs each doing almost
no work).  Hypothesis: TALLER tiles (fewer programs) win when the face
list is tiny, because every tile's list is nearly the whole mesh anyway.

A/B: monkeypatch rasterize_pallas._tile_for_k to (TH, 128) for
TH in {32, 64, 128} (K*TH <= 1024 respected by construction for K<=8)
and measure the full rasterize_meshes fwd and fwd+bwd.  jax caches are
cleared between variants (the tile is baked at trace time).

Writes EXP_SMALLMESH.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.runner import time_fn
    from pytorch3d_tpu.renderer.mesh import rasterize_pallas as rp
    from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
        rasterize_meshes,
    )
    from pytorch3d_tpu.utils import ico_sphere

    orig = rp._tile_for_k
    rows = []
    CASES = [
        ("ico0", 0, 512, 3, 0.0),
        ("ico0", 0, 1024, 3, 0.0),
        ("ico2", 2, 512, 3, 0.0),
        ("ico2", 2, 1024, 3, 0.0),
        ("ico2", 2, 1024, 8, 1e-4),
    ]
    try:
        for th in (32, 64, 128):
            # the emit/blur fine kernel carries ~12 (K, TH, TW) planes:
            # K*TH=1024 at K=8/TH=128 measured 16.78M scoped vmem vs the
            # 16M limit — keep K*TH <= 512 for the experiment
            rp._tile_for_k = lambda K, _th=th: (
                (_th, 128) if K * _th <= 512 else orig(K)
            )
            jax.clear_caches()
            for name, level, size, K, blur in CASES:
                mesh = ico_sphere(level)
                verts = mesh.verts_padded()[0]
                faces = mesh.faces_padded()[0]
                # NDC-ish placement in front of the camera
                mesh_ndc = mesh.update_padded(
                    (verts * 0.9 + jnp.asarray([0.0, 0.0, 2.0]))[None]
                )

                def fwd(v):
                    m = mesh_ndc.update_padded(v)
                    pix, zbuf, bary, dists = rasterize_meshes(
                        m, image_size=size, blur_radius=blur,
                        faces_per_pixel=K,
                    )
                    return zbuf

                def loss(v):
                    m = mesh_ndc.update_padded(v)
                    pix, zbuf, bary, dists = rasterize_meshes(
                        m, image_size=size, blur_radius=blur,
                        faces_per_pixel=K,
                    )
                    sil = jax.nn.sigmoid(-dists / 1e-4)
                    return jnp.sum(sil) * 1e-6 + jnp.sum(zbuf) * 1e-6

                v0 = mesh_ndc.verts_padded()
                jf = jax.jit(fwd)
                jg = jax.jit(jax.grad(loss))
                jf(v0)
                jg(v0)
                dt_f = time_fn(lambda: jf(v0), iters=20)
                dt_g = time_fn(lambda: jg(v0), iters=20)
                rows.append(
                    {
                        "name": f"{name}_{size}px_K{K}"
                        + ("_blur" if blur else ""),
                        "tile_h": th,
                        "fwd_ms": round(dt_f * 1e3, 3),
                        "fwd_bwd_ms": round(dt_g * 1e3, 3),
                    }
                )
                print(json.dumps(rows[-1]), flush=True)
    finally:
        rp._tile_for_k = orig

    out = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    with open(os.path.join(REPO, "EXP_SMALLMESH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote EXP_SMALLMESH.json")


if __name__ == "__main__":
    main()
