"""Point <-> mesh (face / edge) distance losses.

Parity: reference loss/point_mesh_distance.py:263/:330 + csrc/point_mesh/
(2,010 LoC CUDA/C++).

TPU design: per-mesh (P, F) / (P, E) squared-distance matrices computed with
vectorized closed-form point-triangle / point-segment math on the VPU, then
masked min-reductions — no per-primitive loops, and XLA autodiff provides
the backward (the reference ships 12 custom fwd/bwd kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEF_MIN_TRI_AREA = 5e-3


def point_line_segment_distance(p, a, b, eps: float = 1e-8):
    """Squared distance from points p (..., 3) to segments (a, b) (..., 3)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.clip(
        jnp.sum(ab * ab, axis=-1), eps
    )
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.sum((p - proj) ** 2, axis=-1)


def point_triangle_distance(
    p, v0, v1, v2, min_triangle_area: float = _DEF_MIN_TRI_AREA, eps: float = 1e-8
):
    """Squared distance from points to triangles (broadcasting shapes).

    Inside-projection case uses the plane distance; otherwise (or for
    degenerate triangles with area < min_triangle_area) the min over the
    three edge segments (matches csrc/utils/geometry_utils.h PointTriangle
    semantics).
    """
    n = jnp.cross(v1 - v0, v2 - v0)
    area2 = jnp.sum(n * n, axis=-1)
    area = 0.5 * jnp.sqrt(jnp.clip(area2, 0.0))

    # barycentric coordinates of the projection of p
    d = p - v0
    e1 = v1 - v0
    e2 = v2 - v0
    a11 = jnp.sum(e1 * e1, axis=-1)
    a12 = jnp.sum(e1 * e2, axis=-1)
    a22 = jnp.sum(e2 * e2, axis=-1)
    b1 = jnp.sum(d * e1, axis=-1)
    b2 = jnp.sum(d * e2, axis=-1)
    det = jnp.clip(a11 * a22 - a12 * a12, eps)
    u = (a22 * b1 - a12 * b2) / det
    v = (a11 * b2 - a12 * b1) / det
    inside = (u >= 0) & (v >= 0) & (u + v <= 1)

    # plane distance
    n_unit = n / jnp.clip(jnp.sqrt(area2), eps)[..., None]
    d_plane = jnp.sum(d * n_unit, axis=-1) ** 2

    d_edges = jnp.minimum(
        jnp.minimum(
            point_line_segment_distance(p, v0, v1, eps),
            point_line_segment_distance(p, v1, v2, eps),
        ),
        point_line_segment_distance(p, v0, v2, eps),
    )
    use_plane = inside & (area >= min_triangle_area)
    return jnp.where(use_plane, d_plane, d_edges)


def _tris_padded(meshes):
    """(N, F, 3, 3) per-mesh face vertex coords + (N, F) validity."""
    verts = meshes.verts_padded()  # (N, V, 3)
    faces = meshes.faces_padded()  # (N, F, 3)
    fmask = meshes.faces_padded_mask()
    f = jnp.maximum(faces, 0)
    tri = jax.vmap(lambda v, ff: v[ff])(verts, f)  # (N, F, 3, 3)
    return tri, fmask


def _edges_padded(meshes):
    """(N, E, 2, 3) per-mesh edge vertex coords + (N, E) validity.

    The packed edge table is rank-compacted (mesh-grouped, variable counts),
    so we scatter each edge to (mesh_idx, within-mesh-rank) with a static
    per-mesh capacity of 3 * max_faces.
    """
    verts = meshes.verts_packed()  # (N*V, 3)
    edges = meshes.edges_packed()  # (Etot, 2), rank-compacted
    emask = meshes.edges_packed_mask()
    e_mesh = meshes.edges_packed_to_mesh_idx()
    N = len(meshes)
    E = 3 * meshes.max_faces  # per-mesh capacity

    num_per = meshes.num_edges_per_mesh()
    first = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(num_per)[:-1].astype(jnp.int32)]
    )
    m = jnp.maximum(e_mesh, 0)
    within = jnp.arange(edges.shape[0], dtype=jnp.int32) - first[m]
    dest = jnp.where(emask, m * E + within, N * E)

    ev = verts[jnp.maximum(edges, 0)]  # (Etot, 2, 3)
    out = (
        jnp.zeros((N * E, 2, 3), verts.dtype).at[dest].set(ev, mode="drop")
    ).reshape(N, E, 2, 3)
    omask = (
        jnp.zeros((N * E,), bool).at[dest].set(emask, mode="drop")
    ).reshape(N, E)
    return out, omask, e_mesh


def point_mesh_face_distance(
    meshes, pcls, min_triangle_area: float = _DEF_MIN_TRI_AREA
) -> jnp.ndarray:
    """point->nearest-face + face->nearest-point (reference :330)."""
    if len(meshes) != len(pcls):
        raise ValueError("meshes and pointclouds must be equal sized batches")
    N = len(meshes)
    pts = pcls.points_padded()  # (N, P, 3)
    pmask = pcls.points_padded_mask()
    tri, fmask = _tris_padded(meshes)

    d2 = point_triangle_distance(
        pts[:, :, None],  # (N, P, 1, 3)
        tri[:, None, :, 0],
        tri[:, None, :, 1],
        tri[:, None, :, 2],
        min_triangle_area,
    )  # (N, P, F)

    big = jnp.asarray(jnp.inf, d2.dtype)
    d_pf = jnp.min(jnp.where(fmask[:, None, :], d2, big), axis=2)  # (N, P)
    d_fp = jnp.min(jnp.where(pmask[:, :, None], d2, big), axis=1)  # (N, F)

    num_p = jnp.clip(pcls.num_points_per_cloud().astype(d2.dtype), 1.0)
    num_f = jnp.clip(meshes.num_faces_per_mesh().astype(d2.dtype), 1.0)
    point_dist = jnp.sum(
        jnp.where(pmask, d_pf, 0.0) / num_p[:, None]
    )
    face_dist = jnp.sum(jnp.where(fmask, d_fp, 0.0) / num_f[:, None])
    return (point_dist + face_dist) / N


def point_mesh_edge_distance(meshes, pcls) -> jnp.ndarray:
    """point->nearest-edge + edge->nearest-point (reference :263)."""
    if len(meshes) != len(pcls):
        raise ValueError("meshes and pointclouds must be equal sized batches")
    N = len(meshes)
    pts = pcls.points_padded()
    pmask = pcls.points_padded_mask()
    ev, emask, _ = _edges_padded(meshes)

    d2 = point_line_segment_distance(
        pts[:, :, None], ev[:, None, :, 0], ev[:, None, :, 1]
    )  # (N, P, E)
    big = jnp.asarray(jnp.inf, d2.dtype)
    d_pe = jnp.min(jnp.where(emask[:, None, :], d2, big), axis=2)
    d_ep = jnp.min(jnp.where(pmask[:, :, None], d2, big), axis=1)

    num_p = jnp.clip(pcls.num_points_per_cloud().astype(d2.dtype), 1.0)
    num_e = jnp.clip(meshes.num_edges_per_mesh().astype(d2.dtype), 1.0)
    point_dist = jnp.sum(jnp.where(pmask, d_pe, 0.0) / num_p[:, None])
    edge_dist = jnp.sum(jnp.where(emask, d_ep, 0.0) / num_e[:, None])
    return (point_dist + edge_dist) / N
