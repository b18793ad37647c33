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

        # --- two-sided sphere tracing with overshoot backtracking
        # (reference ray_tracing.py:219 `sphere_tracing`): the START
        # tracer advances from t_near, the END tracer retreats from
        # t_far; overshoots into the surface (sdf < 0) back off by
        # line_search_step * sdf for line_step_iters.  The tighter
        # [t_start, t_end] span is what the dense fallback samples — the
        # same n_steps buy much finer roots than spanning the whole
        # bounding sphere.
        def trace(i, carry):
            t_s, t_e = carry
            v_s = eval_sdf(t_s)
            v_e = eval_sdf(t_e)
            t_s_new = t_s + v_s
            t_e_new = t_e - v_e
            for _ in range(self.line_step_iters):
                v_s_new = eval_sdf(t_s_new)
                v_e_new = eval_sdf(t_e_new)
                t_s_new = jnp.where(
                    v_s_new < 0.0,
                    t_s_new - self.line_search_step * v_s,
                    t_s_new,
                )
                t_e_new = jnp.where(
                    v_e_new < 0.0,
                    t_e_new + self.line_search_step * v_e,
                    t_e_new,
                )
            t_s = jnp.clip(t_s_new, t_near, t_far)
            t_e = jnp.clip(t_e_new, t_s, t_far)
            return t_s, t_e

        t, t_end = jax.lax.fori_loop(
            0, self.sphere_tracing_iters, trace, (t_near, t_far)
        )
        sdf_at_t = eval_sdf(t)
        converged = jnp.abs(sdf_at_t) < self.sdf_threshold

        # --- dense fallback: sample n_steps over [t_near, t_end] — the
        # end tracer tightens the far bound; the start stays at t_near
        # because a start tracer that overshot INSIDE the surface would
        # break the positive->negative first-crossing detection
        # (measured: spanning [t, t_end] cost 2 dB at 750 steps)
        ts = t_near[:, None] + jnp.clip(t_end - t_near, 0.0)[
            :, None
        ] * jnp.linspace(0.0, 1.0, self.n_steps)
        vals = sdf((o[:, None] + ts[..., None] * d[:, None]).reshape(-1, 3))
        vals = vals.reshape(M, self.n_steps)
        # first NON-POSITIVE sample (reference ray_tracing.py:471
        # sign*arange argmin trick): requiring a positive predecessor
        # would silently drop rays whose span starts inside a spurious
        # negative lobe of the still-imperfect SDF — those rendered
        # background INSIDE the mask and never received an rgb gradient
        # (measured: hole artifacts + ~4 dB on the cow scene)
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
        # `run_secant_method` returns z_pred)

        # missed rays return the point of MINIMAL sdf along the ray
        # (reference ray_tracing.py:509 `minimal_sdf_points`): the soft
        # miss-mask sigmoid(-alpha*sdf) is evaluated there, which is what
        # lets the mask BCE pull the surface outward into mask-positive
        # regions.  (Returning t_far instead leaves the mask gradient
        # ~zero on false-negative rays — measured IoU stuck at 0.46 on
        # the cow scene.)
        t_min = jnp.take_along_axis(
            ts, jnp.argmin(vals, axis=-1)[:, None], axis=1
        )[:, 0]
        t_final = jnp.where(converged, t, jnp.where(any_cross, t_secant, t_min))
        network_object_mask = hit_sphere & (converged | any_cross)
        points = o + t_final[:, None] * d
        return points, network_object_mask, t_final
