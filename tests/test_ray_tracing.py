"""RayTracing (IDR sphere tracer) semantics against analytic SDFs.

Pins the reference's accounting (reference implicitron/models/renderer/
ray_tracing.py:48-157): tracer-resolved hit iff the two tracers have
not crossed; stalled (grazing) rays are resolved by the dense sampler
over the TIGHT remaining interval; misses return minimal-sdf points.
"""

import numpy as np
import jax.numpy as jnp

from pytorch3d_tpu.implicitron.models.renderer.ray_tracing import RayTracing


def _sphere_sdf(radius=0.8):
    return lambda p: jnp.linalg.norm(p, axis=-1) - radius


def _rays(impact_params, z0=3.0):
    """Horizontal rays at height b marching along -z toward a sphere at
    the origin: origin (b, 0, z0), direction (0, 0, -1)."""
    b = np.asarray(impact_params, np.float32)
    o = np.stack([b, np.zeros_like(b), np.full_like(b, z0)], axis=-1)
    d = np.broadcast_to(
        np.asarray([0.0, 0.0, -1.0], np.float32), o.shape
    )
    return jnp.asarray(o)[None], jnp.asarray(d)[None]


class TestRayTracing:
    def test_direct_hits_analytic_depth(self):
        """Central rays: traced depth matches z0 - sqrt(r^2 - b^2)."""
        r = 0.8
        b = [0.0, 0.2, 0.4, 0.6]
        o, d = _rays(b)
        tracer = RayTracing(
            object_bounding_sphere=1.0, sphere_tracing_iters=16,
            n_steps=24, n_secant_steps=8,
        )
        mask = jnp.ones(o.shape[:-1], bool)
        pts, net_mask, dists = tracer(_sphere_sdf(r), o, mask, d)
        assert bool(jnp.all(net_mask)), "central rays must hit"
        expect = 3.0 - np.sqrt(r**2 - np.asarray(b) ** 2)
        np.testing.assert_allclose(
            np.asarray(dists), expect, atol=2e-3
        )
        # surface points lie on the sphere
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts), axis=-1), r, atol=2e-3
        )

    def test_grazing_rays_resolved_by_tight_sampler(self):
        """Rays just inside the silhouette stall the tracer (steps
        shrink with the sdf); the tight-span sampler must still find
        them, and rays just outside must stay misses.  The round-5
        wide-span design missed these: 24 samples over the whole
        sphere chord skip the short negative lobe at grazing
        incidence."""
        r = 0.8
        inside = [0.788, 0.792, 0.796]
        outside = [0.804, 0.81, 0.82]
        o, d = _rays(inside + outside)
        tracer = RayTracing(
            object_bounding_sphere=1.0, sphere_tracing_iters=8,
            n_steps=24, n_secant_steps=8,
        )
        mask = jnp.ones(o.shape[:-1], bool)
        pts, net_mask, dists = tracer(_sphere_sdf(r), o, mask, d)
        got = np.asarray(net_mask).reshape(-1)
        assert got[: len(inside)].all(), f"grazing hits lost: {got}"
        assert not got[len(inside):].any(), f"false silhouette hits: {got}"
        # grazing depths still approximate the analytic front crossing
        expect = 3.0 - np.sqrt(r**2 - np.asarray(inside) ** 2)
        np.testing.assert_allclose(
            np.asarray(dists).reshape(-1)[: len(inside)], expect, atol=0.1
        )

    def test_misses_return_minimal_sdf_points(self):
        """Missing rays return the closest-approach point so the soft
        miss-mask sigmoid(-alpha*sdf) has a live gradient there
        (reference minimal_sdf_points :509)."""
        r = 0.5
        b = [0.7, 0.9]
        o, d = _rays(b)
        tracer = RayTracing(
            object_bounding_sphere=1.0, sphere_tracing_iters=8,
            n_steps=48, n_secant_steps=8,
        )
        mask = jnp.ones(o.shape[:-1], bool)
        pts, net_mask, dists = tracer(_sphere_sdf(r), o, mask, d)
        assert not bool(jnp.any(net_mask))
        # closest approach of ray b to the origin-centered sphere is at
        # z ~ 0 -> the returned point is near (b, 0, 0)
        p = np.asarray(pts).reshape(-1, 3)
        np.testing.assert_allclose(p[:, 2], 0.0, atol=0.15)
        np.testing.assert_allclose(p[:, 0], np.asarray(b), atol=1e-3)

    def test_ray_outside_bounding_sphere_misses(self):
        o, d = _rays([1.5])
        tracer = RayTracing(object_bounding_sphere=1.0)
        mask = jnp.ones(o.shape[:-1], bool)
        _, net_mask, _ = tracer(_sphere_sdf(0.8), o, mask, d)
        assert not bool(jnp.any(net_mask))

    def test_overshot_span_start_still_hits(self):
        """A span that starts inside the surface (start tracer overshot
        into a negative region) must register a hit at the span start,
        not a hole (reference sign*arange argmin trick :391)."""
        # torus-like sdf with a thin shell the tracer overshoots:
        # use a plain sphere but a huge first step via a lying sdf that
        # doubles distances (overshoot by construction)
        r = 0.8

        def sdf(p):
            return 2.0 * (jnp.linalg.norm(p, axis=-1) - r)

        o, d = _rays([0.0, 0.3])
        tracer = RayTracing(
            object_bounding_sphere=1.0, sphere_tracing_iters=6,
            n_steps=24, n_secant_steps=8, line_step_iters=1,
        )
        mask = jnp.ones(o.shape[:-1], bool)
        pts, net_mask, dists = tracer(sdf, o, mask, d)
        assert bool(jnp.all(net_mask))
        # hits land on (or very near) the sphere surface
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts), axis=-1), r, atol=5e-2
        )
