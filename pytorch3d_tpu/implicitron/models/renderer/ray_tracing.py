"""Sphere tracing for SDF rendering (IDR).

Parity: reference implicitron/models/renderer/ray_tracing.py:14
(`RayTracing`: sphere tracing + secant root refinement).

TPU design: the reference's data-dependent while loops and masked index
updates become fixed-iteration `lax.fori_loop`s over all rays (inactive
rays carry through unchanged) — XLA-friendly, no dynamic ray compaction.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ...tools.config import Configurable


@dataclasses.dataclass
class RayTracing(Configurable):
    object_bounding_sphere: float = 1.0
    sdf_threshold: float = 5.0e-5
    line_search_step: float = 0.5
    line_step_iters: int = 1
    sphere_tracing_iters: int = 10
    n_steps: int = 100
    n_secant_steps: int = 8

    def __call__(
        self,
        sdf: Callable[[jnp.ndarray], jnp.ndarray],  # (M, 3) -> (M,)
        cam_loc: jnp.ndarray,  # (B, R, 3) ray origins
        object_mask: jnp.ndarray,  # (B, R) bool
        ray_directions: jnp.ndarray,  # (B, R, 3) unit
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (points (B*R, 3), network_object_mask (B*R,), dists (B*R,))."""
        B, R, _ = cam_loc.shape
        o = cam_loc.reshape(-1, 3)
        d = ray_directions.reshape(-1, 3)
        M = o.shape[0]

        # intersect rays with the bounding sphere for [t_near, t_far]
        b = jnp.sum(o * d, axis=-1)
        c = jnp.sum(o * o, axis=-1) - self.object_bounding_sphere**2
        disc = b * b - c
        hit_sphere = disc > 0
        sq = jnp.sqrt(jnp.clip(disc, 0.0))
        t_near = jnp.clip(-b - sq, 0.0)
        t_far = jnp.clip(-b + sq, 0.0)

        def eval_sdf(t):
            return sdf(o + t[:, None] * d)

        # --- forward sphere tracing
        def trace(i, t):
            v = eval_sdf(t)
            t_new = t + v
            return jnp.clip(t_new, t_near, t_far)

        t = jax.lax.fori_loop(0, self.sphere_tracing_iters, trace, t_near)
        sdf_at_t = eval_sdf(t)
        converged = jnp.abs(sdf_at_t) < self.sdf_threshold

        # --- dense fallback: sample n_steps along the ray, find first sign
        # change, refine by secant
        ts = t_near[:, None] + (t_far - t_near)[:, None] * jnp.linspace(
            0.0, 1.0, self.n_steps
        )
        vals = sdf((o[:, None] + ts[..., None] * d[:, None]).reshape(-1, 3))
        vals = vals.reshape(M, self.n_steps)
        sign_change = (vals[:, :-1] > 0) & (vals[:, 1:] <= 0)
        any_cross = jnp.any(sign_change, axis=-1)
        first = jnp.argmax(sign_change, axis=-1)
        t_lo = jnp.take_along_axis(ts, first[:, None], axis=1)[:, 0]
        t_hi = jnp.take_along_axis(ts, first[:, None] + 1, axis=1)[:, 0]
        f_lo = jnp.take_along_axis(vals, first[:, None], axis=1)[:, 0]
        f_hi = jnp.take_along_axis(vals, first[:, None] + 1, axis=1)[:, 0]

        def secant(i, carry):
            t_lo, t_hi, f_lo, f_hi = carry
            denom = f_hi - f_lo
            t_mid = t_lo - f_lo * (t_hi - t_lo) / jnp.where(
                jnp.abs(denom) < 1e-12, 1.0, denom
            )
            f_mid = eval_sdf(t_mid)
            lo = f_mid > 0
            t_lo = jnp.where(lo, t_mid, t_lo)
            f_lo = jnp.where(lo, f_mid, f_lo)
            t_hi = jnp.where(lo, t_hi, t_mid)
            f_hi = jnp.where(lo, f_hi, f_mid)
            return t_lo, t_hi, f_lo, f_hi

        t_lo, t_hi, _, _ = jax.lax.fori_loop(
            0, self.n_secant_steps, secant, (t_lo, t_hi, f_lo, f_hi)
        )
        t_secant = 0.5 * (t_lo + t_hi)

        t_final = jnp.where(converged, t, jnp.where(any_cross, t_secant, t_far))
        network_object_mask = hit_sphere & (converged | any_cross)
        points = o + t_final[:, None] * d
        return points, network_object_mask, t_final
