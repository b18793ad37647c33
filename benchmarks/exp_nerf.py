"""NeRF train-step breakdown + MFU experiment (run on real TPU).

Separates the mlp256x8 train step into attributable phases and variants
(VERDICT r2 #4):

  * fwd loss only / grad only / optimizer-only, per precision variant
    (fp32, bf16 activations, bf16+remat) at the 4096-ray training batch;
  * ray-batch scaling 4096 -> 8192 -> 16384 on the bf16_remat variant
    (remat keeps the backward inside HBM; the fp32 backward OOMs past
    4096 rays, which is why the non-remat variants stay at 4096);
  * XLA cost-analysis flops -> achieved FLOP/s and MFU vs the v5e
    bf16 MXU peak (197 TFLOP/s; fp32 matmuls lower to multi-pass bf16).

Writes EXP_NERF.json. Usage: python -m benchmarks.exp_nerf
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import optax

from benchmarks.runner import time_fn

BF16_PEAK = 197e12  # v5e MXU peak (bf16)


def build(n_rays=4096, n_pts=64, dtype=None, remat=False):
    from pytorch3d_tpu.models.nerf.nerf_renderer import RadianceFieldRenderer
    from pytorch3d_tpu.renderer import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )

    model = RadianceFieldRenderer(
        image_width=400,
        image_height=400,
        n_pts_per_ray=n_pts,
        n_pts_per_ray_fine=n_pts,
        n_rays_per_image=n_rays,
        min_depth=2.0,
        max_depth=6.0,
        n_hidden_neurons_xyz=256,
        n_hidden_neurons_dir=128,
        n_layers_xyz=8,
        remat=remat,
        **({"dtype": dtype} if dtype is not None else {}),
    )
    R, T = look_at_view_transform(dist=4.0, elev=20.0, azim=30.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T, znear=0.5, zfar=10.0)
    image = jnp.ones((1, 400, 400, 3), jnp.float32) * 0.5
    key = jax.random.PRNGKey(0)
    params = model.init(jax.random.PRNGKey(1), cams, image=image, key=key)
    return model, params, cams, image, key


def flops_of(fn, *args) -> float:
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def fused_trunk_flops(n_rays: int, n_pts: int, grad: bool) -> float:
    """Analytic FLOPs of the fused-Pallas NeRF field (XLA's
    cost_analysis reports 0 for custom calls, so the rows add these
    back).  Trunk: layer input dims for 63-dim embeds, skip at 5:
    63 + 4*256 + 319 + 2*256 = 1918 inputs x 256 out.  Head (fused since
    the full-field kernel): intermediate 256x256, color hidden
    (256+27)x128, density 256x1, color out 128x3.  Coarse evaluates
    n_pts points/ray, fine re-evaluates the combined 2*n_pts samples."""
    sum_in = 63 + 4 * 256 + (256 + 63) + 2 * 256
    head = 256 * 256 + (256 + 27) * 128 + 256 + 128 * 3
    pts_total = n_rays * n_pts + n_rays * (2 * n_pts)
    f = 2.0 * pts_total * (sum_in * 256 + head)
    return 3.0 * f if grad else f


def main():
    rows = []

    def emit(name, ms, flops=0.0, **kw):
        row = {"name": name, "ms": round(ms, 3), **kw}
        if flops:
            row["tflops_per_s"] = round(flops / (ms / 1e3) / 1e12, 2)
            row["mfu_vs_bf16_peak"] = round(
                flops / (ms / 1e3) / BF16_PEAK, 4
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Per-variant phase breakdown at the 4096-ray training batch; the
    # bf16_remat variant additionally scales the ray batch (8k/16k) —
    # remat keeps backward activations in budget where plain fp32 OOMs.
    for tag, kw in [
        ("fp32", {}),
        ("bf16", {"dtype": jnp.bfloat16}),
        ("bf16_remat", {"dtype": jnp.bfloat16, "remat": True}),
    ]:
        for n_rays in (4096,) if tag != "bf16_remat" else (4096, 8192, 16384):
            model, params, cams, image, key = build(n_rays=n_rays, **kw)

            def loss_fn(p, k):
                out, metrics = model.apply(
                    p, cams, image=image, key=k, training=True
                )
                return metrics["mse_coarse"] + metrics["mse_fine"]

            fwd = jax.jit(loss_fn)
            f_fwd = flops_of(loss_fn, params, key)
            if jax.default_backend() == "tpu":
                # trunk runs inside pallas_call -> invisible to
                # cost_analysis; add its analytic FLOPs back
                f_fwd += fused_trunk_flops(n_rays, 64, grad=False)
            emit(
                f"fwd_{tag}_{n_rays}rays",
                time_fn(lambda: fwd(params, key)) * 1e3,
                f_fwd,
            )

            grad = jax.jit(jax.grad(loss_fn))
            f_grad = flops_of(jax.grad(loss_fn), params, key)
            if jax.default_backend() == "tpu":
                f_grad += fused_trunk_flops(n_rays, 64, grad=True)
            emit(
                f"grad_{tag}_{n_rays}rays",
                time_fn(lambda: grad(params, key)) * 1e3,
                f_grad,
            )

            optimizer = optax.adam(5e-4)
            opt_state = optimizer.init(params)
            g0 = grad(params, key)

            def opt_only(p, s, g):
                up, s2 = optimizer.update(g, s, p)
                return optax.apply_updates(p, up), s2

            optj = jax.jit(opt_only)
            emit(
                f"opt_{tag}_{n_rays}rays",
                time_fn(lambda: optj(params, opt_state, g0)) * 1e3,
            )

    # ---- shape probes (VERDICT r3 #4): is 0.27 the ceiling at 256-wide?
    # An 8-layer Dense stack with EXACTLY the mlp256x8 layer shapes (skip
    # concat included), isolated from all NeRF plumbing, measures what the
    # MXU can achieve at this layer width; the 512-wide row shows the
    # bound is the layer WIDTH (HBM arithmetic intensity), not the model.
    import flax.linen as nn

    class _MLPProbe(nn.Module):
        hidden: int
        n_layers: int = 8
        skips: tuple = (5,)

        @nn.compact
        def __call__(self, x):
            z = x
            y = x
            for li in range(self.n_layers):
                if li in self.skips:
                    y = jnp.concatenate([y, z], axis=-1)
                y = nn.Dense(self.hidden, dtype=jnp.bfloat16)(y)
                y = nn.relu(y)
            return nn.Dense(1, dtype=jnp.bfloat16)(y)

    n_points = 4096 * 64  # the coarse-pass point batch
    for hidden in (256, 512):
        probe = _MLPProbe(hidden=hidden)
        x = jnp.ones((n_points, 63), jnp.bfloat16)
        pp = probe.init(jax.random.PRNGKey(0), x)

        def probe_loss(p, x):
            return jnp.sum(probe.apply(p, x).astype(jnp.float32))

        fwdp = jax.jit(probe_loss)
        f_p = flops_of(probe_loss, pp, x)
        emit(
            f"mlp_shape_probe_{hidden}w_fwd",
            time_fn(lambda: fwdp(pp, x)) * 1e3,
            f_p,
        )
        gradp = jax.jit(jax.grad(probe_loss))
        f_g = flops_of(jax.grad(probe_loss), pp, x)
        emit(
            f"mlp_shape_probe_{hidden}w_grad",
            time_fn(lambda: gradp(pp, x)) * 1e3,
            f_g,
        )

    # residual accounting: fwd minus two isolated MLP passes (coarse+fine
    # evaluate the same point count each) = the non-MLP stream (embedding,
    # EA raymarch, sample_pdf, sampling) — goes in PERF_ANALYSIS.md
    # (computed offline from the rows above).

    # full mixed-precision step for reference (matches the grid row)
    from pytorch3d_tpu.parallel import make_nerf_train_step

    model, params, cams, image, key = build(n_rays=4096)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    step = make_nerf_train_step(model, optimizer, compute_dtype=jnp.bfloat16)
    emit(
        "full_step_mixed_4096rays",
        time_fn(lambda: step(params, opt_state, cams, image, key)) * 1e3,
    )

    with open("EXP_NERF.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
