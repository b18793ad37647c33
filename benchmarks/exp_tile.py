"""Kernel-variant experiments for the fine rasterizer (run on real TPU).

Times the Pallas select kernel at different pixel-tile shapes (loop-carry
register pressure study), and fused-emit vs select+XLA-interpolate for the
full fwd / fwd+bwd pipeline.  Appends JSON rows to EXP_TILE.json.
"""

import json
import time

import jax
import jax.numpy as jnp

from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    MeshRasterizer,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh import rasterize_meshes as _rm_pkg
from pytorch3d_tpu.renderer.mesh.rasterize_meshes import interpolate_fragments
from pytorch3d_tpu.renderer.mesh import rasterize_pallas as rp
from pytorch3d_tpu.utils import ico_sphere


def setup(level, size, K, blur):
    mesh = ico_sphere(level)
    R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=30.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    rast = MeshRasterizer(
        cams,
        RasterizationSettings(image_size=size, blur_radius=blur, faces_per_pixel=K),
    )
    tm = rast.transform(mesh)
    fv = tm.verts_padded()[0][tm.faces_padded()[0]]
    valid = tm.faces_padded()[0, :, 0] >= 0
    return fv, valid


def _force(out):
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench(fn, *args, n=20):
    o = fn(*args)
    _force(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    _force(o)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rows = []

    def emit(name, ms, **kw):
        row = {"name": name, "ms": ms, **kw}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for level, size, K, blur in [(4, 512, 8, 1e-4), (5, 512, 8, 1e-4), (6, 1024, 8, 1e-5)]:
        fv, valid = setup(level, size, K, blur)
        tag = f"ico{level}_{size}px_K{K}"

        def make_select(t):
            def run(v):
                return rp.rasterize_topk_pallas(
                    v, valid, (size, size), blur, K, tile=t
                )

            return jax.jit(run)

        for tile in [(32, 128)]:
            emit(
                f"select_{tag}_tile{tile[0]}x{tile[1]}",
                bench(make_select(tile), fv),
            )

        # fused fragment emission (current default fwd)
        f_emit = jax.jit(
            lambda v: rp.rasterize_fragments_pallas(v, valid, (size, size), blur, K)
        )
        emit(f"emit_fused_{tag}", bench(f_emit, fv))

        # select + XLA interpolate fwd
        def sel_interp(v):
            idx = jax.lax.stop_gradient(
                rp.rasterize_topk_pallas(
                    jax.lax.stop_gradient(v), valid, (size, size), blur, K
                )
            )
            z, b, d = interpolate_fragments(
                v, idx, (size, size), False, False
            )
            return idx, z, b, d



        # fwd+bwd: fused pallas-grad vs select+interp autodiff
        def loss_fused(v):
            out = rp.rasterize_fragments_pallas(v, valid, (size, size), blur, K)
            return (
                jnp.sum(jax.nn.sigmoid(-out[3] / blur)) * 1e-6
                + jnp.sum(out[1]) * 1e-6
            )

        def loss_si(v):
            _, z, b, d = sel_interp(v)
            return (
                jnp.sum(jax.nn.sigmoid(-d / blur)) * 1e-6 + jnp.sum(z) * 1e-6
            )

        emit(f"fwdbwd_fused_{tag}", bench(jax.jit(jax.grad(loss_fused)), fv))

    with open("EXP_TILE.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
