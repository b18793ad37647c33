"""Uniform point sampling from mesh surfaces.

Parity: reference ops/sample_points_from_meshes.py:24 (algorithm documented
at :86-110): per-mesh area-weighted multinomial face choice + uniform random
barycentric coordinates.

TPU design: the multinomial becomes `jax.random.categorical` over per-mesh
log-areas (padded faces get -inf logits), fully batched — no per-mesh host
loop.  Barycentrics use the sqrt trick for uniformity.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..common.math_utils import safe_norm, safe_normalize


def sample_points_from_meshes(
    meshes,
    num_samples: int = 10000,
    return_normals: bool = False,
    return_textures: bool = False,
    key: Optional[jax.Array] = None,
):
    """Sample points uniformly (by area) from a batch of meshes.

    Args:
        meshes: Meshes batch (N meshes).
        num_samples: samples per mesh (static).
        return_normals: also return per-sample face normals.
        return_textures: also return sampled textures.
        key: PRNG key (defaults to PRNGKey(0); pass explicitly for fresh draws).

    Returns:
        samples (N, num_samples, 3) [, normals (N, num_samples, 3)]
        [, textures (N, num_samples, C)].
    """
    if meshes.isempty():
        raise ValueError("Meshes are empty.")
    if key is None:
        key = jax.random.PRNGKey(0)
    key_face, key_w = jax.random.split(key)

    N = len(meshes)
    F = meshes.max_faces
    verts_padded = meshes.verts_padded()  # (N, V, 3)
    faces_padded = meshes.faces_padded()  # (N, F, 3)
    fmask = meshes.faces_padded_mask()  # (N, F)

    f = jnp.maximum(faces_padded, 0)
    v0 = jnp.take_along_axis(verts_padded, f[..., 0:1].repeat(3, -1), axis=1)
    v1 = jnp.take_along_axis(verts_padded, f[..., 1:2].repeat(3, -1), axis=1)
    v2 = jnp.take_along_axis(verts_padded, f[..., 2:3].repeat(3, -1), axis=1)

    n = jnp.cross(v1 - v0, v2 - v0)  # (N, F, 3)
    areas = 0.5 * safe_norm(n, axis=-1)
    areas = jnp.where(fmask, areas, 0.0)

    logits = jnp.log(jnp.clip(areas, 1e-30))
    logits = jnp.where(fmask, logits, -jnp.inf)
    sample_face_idxs = jax.random.categorical(
        key_face, logits[:, None, :], axis=-1, shape=(N, num_samples)
    )  # (N, S)

    take = jax.vmap(lambda x, i: x[i])
    a = take(v0, sample_face_idxs)
    b = take(v1, sample_face_idxs)
    c = take(v2, sample_face_idxs)

    w0, w1, w2 = _rand_barycentric_coords(key_w, (N, num_samples), a.dtype)
    samples = w0[..., None] * a + w1[..., None] * b + w2[..., None] * c

    out = (samples,)
    if return_normals:
        fn = safe_normalize(n)
        normals = take(fn, sample_face_idxs)
        out = out + (normals,)
    if return_textures:
        if meshes.textures is None:
            raise ValueError("Meshes do not contain textures.")
        # Fake one-sample-per-"pixel" fragments and reuse texture sampling
        # (the reference does the same, sample_points_from_meshes.py:112-133).
        from ..renderer.mesh.rasterizer import Fragments

        first = meshes.mesh_to_faces_packed_first_idx()
        pix_to_face = (sample_face_idxs + first[:, None]).reshape(
            N, num_samples, 1, 1
        )
        bary = jnp.stack([w0, w1, w2], axis=-1).reshape(N, num_samples, 1, 1, 3)
        dummy = jnp.zeros((N, num_samples, 1, 1), samples.dtype)
        fragments = Fragments(
            pix_to_face=pix_to_face, zbuf=dummy, bary_coords=bary, dists=dummy
        )
        textures = meshes.sample_textures(fragments)[:, :, 0, 0]
        out = out + (textures,)
    return out if len(out) > 1 else out[0]


def _rand_barycentric_coords(key, shape, dtype):
    """Uniform barycentrics via the sqrt trick (reference :177)."""
    u, v = jax.random.uniform(key, (2,) + tuple(shape), dtype=dtype)
    su = jnp.sqrt(u)
    w0 = 1.0 - su
    w1 = su * (1.0 - v)
    w2 = su * v
    return w0, w1, w2
