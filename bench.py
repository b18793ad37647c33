"""Headline benchmark: soft mesh rasterization forward+backward at 512².

Mirrors the reference's bm_rasterize_meshes grid (tests/benchmarks/
bm_rasterize_meshes.py:43-60: ico level 4, image 512, faces_per_pixel) and
the BASELINE.json north-star config ("cow 512² soft-raster fwd+bwd").
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs on whatever jax.default_backend() is (real TPU chip under the driver).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp


def main() -> None:
    from pytorch3d_tpu.renderer import (
        FoVPerspectiveCameras,
        MeshRasterizer,
        RasterizationSettings,
        look_at_view_transform,
    )
    from pytorch3d_tpu.renderer.mesh.rasterize_meshes import rasterize_meshes
    from pytorch3d_tpu.utils import ico_sphere

    image_size = 512
    K = 8
    blur = 1e-4

    mesh = ico_sphere(4)  # 5120 faces (bm grid ico level 4)
    R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=30.0)
    cameras = FoVPerspectiveCameras.create(R=R, T=T)
    rasterizer = MeshRasterizer(
        cameras,
        RasterizationSettings(
            image_size=image_size, blur_radius=blur, faces_per_pixel=K
        ),
    )
    mesh_ndc = rasterizer.transform(mesh)
    verts_ndc = mesh_ndc.verts_padded()

    @jax.jit
    def fwd_bwd(verts):
        def loss(v_in):
            m = mesh_ndc.update_padded(v_in)
            pix, zbuf, bary, dists = rasterize_meshes(
                m, image_size=image_size, blur_radius=blur, faces_per_pixel=K
            )
            # soft-silhouette-style scalar: sigmoid of signed dists + z term
            sil = jax.nn.sigmoid(-dists / 1e-4)
            return jnp.sum(sil) * 1e-6 + jnp.sum(zbuf) * 1e-6

        val, grad = jax.value_and_grad(loss)(verts)
        return val, grad

    # warmup/compile happens inside time_fn; the harness subtracts the
    # tunnel-RTT sync cost (see benchmarks/runner.py:_force).
    from benchmarks.runner import time_fn

    dt = time_fn(lambda: fwd_bwd(verts_ndc), warmup=2, iters=20)

    mpix_s = image_size * image_size / dt / 1e6
    # Baseline: the naive XLA all-faces-x-all-pixels scan measured on the
    # same chip at round-1 start (0.12 Mpix/s) — the pre-kernel design.
    naive_xla_baseline = 0.12
    print(
        json.dumps(
            {
                "metric": f"soft_rasterize_{image_size}px_ico4_K{K}_fwd_bwd",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / naive_xla_baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
