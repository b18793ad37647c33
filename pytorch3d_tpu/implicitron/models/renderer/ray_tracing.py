"""Sphere tracing for SDF rendering (IDR).

Parity: reference implicitron/models/renderer/ray_tracing.py:14
(`RayTracing`: two-sided sphere tracing + dense sampler + secant root
refinement).

TPU design: the reference's data-dependent while loops and masked index
updates become fixed-iteration `lax.fori_loop`s over all rays (inactive
rays carry through unchanged) — XLA-friendly, no dynamic ray compaction.

Structure (mirrors the reference's accounting, ray_tracing.py:48-157):
1. start/end tracers march inward from the bounding-sphere
   intersections, each with an `unfinished` mask (frozen once its sdf
   drops below threshold, or once the tracers cross);
2. hit/miss for tracer-resolved rays is `t_start < t_end` (a missing
   ray marches the start tracer past the end tracer;
   reference :100 `network_object_mask = acc_start_dis < acc_end_dis`);
3. rays still unfinished after the iteration cap (grazing rays near
   the silhouette) go to the dense sampler over the TIGHT remaining
   interval [t_start, t_end] (reference :102-117 `sampler_min_max`) —
   n_steps samples of a small span resolve silhouette crossings that
   the same n_steps over the whole sphere chord miss (measured: this
   was the round-5 boundary-error driver, interior MSE 0.002 vs
   boundary 0.021);
4. the first NON-POSITIVE sample marks the crossing (reference :391
   sign*arange argmin trick): a span that starts inside a negative
   region yields index 0 — a hit at the tracer's stopped position, so
   start-side overshoot cannot punch holes;
5. secant refinement on the bracketing pair (reference :427);
6. missed rays return the point of minimal sdf (soft-mask support):
   sampler-handled rays over their tight span, tracer-resolved misses
   over the original sphere chord (reference :509
   `minimal_sdf_points` on [min_dis, max_dis]).
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

        # --- two-sided sphere tracing with unfinished masks and
        # overshoot backtracking (reference sphere_tracing :159-339)
        def trace(i, carry):
            t_s, t_e, unf_s, unf_e = carry
            v_s = eval_sdf(t_s)
            v_e = eval_sdf(t_e)
            # freeze converged tracers (signed threshold, reference
            # :242-246: any sdf <= threshold counts as surface)
            unf_s = unf_s & (v_s > self.sdf_threshold)
            unf_e = unf_e & (v_e > self.sdf_threshold)
            step_s = jnp.where(unf_s, v_s, 0.0)
            step_e = jnp.where(unf_e, v_e, 0.0)
            t_s_new = t_s + step_s
            t_e_new = t_e - step_e
            # back off tracers that overshot inside (sdf < 0),
            # reference :292-301: (1 - step) / 2^k * last step
            for k in range(self.line_step_iters):
                v_s_new = eval_sdf(t_s_new)
                v_e_new = eval_sdf(t_e_new)
                back = (1.0 - self.line_search_step) / (2.0**k)
                t_s_new = jnp.where(
                    unf_s & (v_s_new < 0.0), t_s_new - back * step_s, t_s_new
                )
                t_e_new = jnp.where(
                    unf_e & (v_e_new < 0.0), t_e_new + back * step_e, t_e_new
                )
            # crossed tracers end both marches (reference :325-328)
            alive = t_s_new < t_e_new
            unf_s = unf_s & alive
            unf_e = unf_e & alive
            return t_s_new, t_e_new, unf_s, unf_e

        t_s, t_e, unf_s, unf_e = jax.lax.fori_loop(
            0,
            self.sphere_tracing_iters,
            trace,
            (t_near, t_far, hit_sphere, hit_sphere),
        )
        tracer_hit = t_s < t_e  # reference :100
        sampler_mask = unf_s  # stalled start tracer -> dense sampler

        # --- dense sampler over the TIGHT remaining interval
        # [t_s, t_e] of stalled rays (reference ray_sampler :340-427).
        # Evaluated for every ray (XLA style); consumed where
        # sampler_mask.
        span = jnp.clip(t_e - t_s, 0.0)
        ts = t_s[:, None] + span[:, None] * jnp.linspace(
            0.0, 1.0, self.n_steps
        )
        vals = sdf((o[:, None] + ts[..., None] * d[:, None]).reshape(-1, 3))
        vals = vals.reshape(M, self.n_steps)
        neg = vals <= 0
        any_cross = jnp.any(neg, axis=-1)
        first = jnp.argmax(neg, axis=-1)
        lo_idx = jnp.maximum(first - 1, 0)
        t_lo = jnp.take_along_axis(ts, lo_idx[:, None], axis=1)[:, 0]
        t_hi = jnp.take_along_axis(ts, first[:, None], axis=1)[:, 0]
        f_lo = jnp.take_along_axis(vals, lo_idx[:, None], axis=1)[:, 0]
        f_hi = jnp.take_along_axis(vals, first[:, None], axis=1)[:, 0]

        def secant(i, carry):
            t_lo, t_hi, f_lo, f_hi, _ = carry
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
            return t_lo, t_hi, f_lo, f_hi, t_mid

        *_, t_secant = jax.lax.fori_loop(
            0,
            self.n_secant_steps,
            secant,
            (t_lo, t_hi, f_lo, f_hi, 0.5 * (t_lo + t_hi)),
        )
        # the LAST secant estimate, not the bracket midpoint: the secant
        # bracket often shrinks one-sided, so its midpoint stays coarse
        # while z_pred has already converged (reference ray_tracing.py
        # `run_secant_method` returns z_pred).  A crossing at index 0
        # (span starts inside the surface) degenerates to the span
        # start: t_lo == t_hi there, the secant is a fixed point.
        t_secant = jnp.where(first == 0, t_s, t_secant)

        # --- missed rays return the point of MINIMAL sdf along the ray
        # (reference minimal_sdf_points :509): the soft miss-mask
        # sigmoid(-alpha*sdf) is evaluated there, which is what lets the
        # mask BCE pull the surface outward into mask-positive regions.
        # Sampler-handled misses use their tight span's minimum
        # (reference :406-419); tracer-resolved misses sample the
        # ORIGINAL sphere chord [t_near, t_far] (reference :145-155 on
        # [min_dis, max_dis]).
        t_min_tight = jnp.take_along_axis(
            ts, jnp.argmin(vals, axis=-1)[:, None], axis=1
        )[:, 0]
        ts_wide = t_near[:, None] + jnp.clip(t_far - t_near, 0.0)[
            :, None
        ] * jnp.linspace(0.0, 1.0, self.n_steps)
        vals_wide = sdf(
            (o[:, None] + ts_wide[..., None] * d[:, None]).reshape(-1, 3)
        ).reshape(M, self.n_steps)
        t_min_wide = jnp.take_along_axis(
            ts_wide, jnp.argmin(vals_wide, axis=-1)[:, None], axis=1
        )[:, 0]
        t_min = jnp.where(sampler_mask, t_min_tight, t_min_wide)

        # --- combine: tracer-resolved rays keep t_s (hit) with
        # tracer_hit as the mask; sampler rays hit iff their first
        # non-positive sample exists (reference sampler_net_obj_mask
        # :425)
        sampler_hit = sampler_mask & any_cross
        network_object_mask = hit_sphere & jnp.where(
            sampler_mask, sampler_hit, tracer_hit
        )
        t_hit = jnp.where(sampler_mask, t_secant, t_s)
        t_final = jnp.where(network_object_mask, t_hit, t_min)
        points = o + t_final[:, None] * d
        return points, network_object_mask, t_final
