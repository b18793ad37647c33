"""Exact 3D IoU of oriented boxes.

Parity: reference ops/iou_box3d.py:114 (`box3d_overlap`) +
csrc/iou_box3d/ (1,810 LoC; plane-clipping algorithm iou_box3d.cu:17-41).

TPU design: each box contributes 12 outward-wound triangles; every
triangle is clipped against the other box's 6 half-spaces with a
static-capacity (10-vertex) Sutherland-Hodgman pass (a `lax.scan` over
planes), and the intersection volume follows from the divergence theorem
over the clipped faces of BOTH boxes — no dynamic polygon lists, no hull.

Box corner convention (reference iou_box3d.py:22-41, unit box):
    (0) [0,0,0]  (1) [1,0,0]  (2) [1,1,0]  (3) [0,1,0]
    (4) [0,0,1]  (5) [1,0,1]  (6) [1,1,1]  (7) [0,1,1]
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# 6 quad faces with outward winding for the unit-box corner order above.
_QUADS = (
    (0, 3, 2, 1),  # z = 0 (outward -z)
    (4, 5, 6, 7),  # z = 1 (+z)
    (0, 1, 5, 4),  # y = 0 (-y)
    (3, 7, 6, 2),  # y = 1 (+y)
    (0, 4, 7, 3),  # x = 0 (-x)
    (1, 2, 6, 5),  # x = 1 (+x)
)
_CAP = 10  # 3 starting verts + at most 6 plane clips + margin
_EPS = 1e-6


def _box_planes(box: jnp.ndarray):
    """(8, 3) -> (6, 3) plane points + (6, 3) outward unit-ish normals."""
    pts = jnp.stack([box[q[0]] for q in _QUADS])
    normals = jnp.stack(
        [
            jnp.cross(box[q[1]] - box[q[0]], box[q[3]] - box[q[0]])
            for q in _QUADS
        ]
    )
    # outward for right-handed corner order; flip if box is mirrored
    center = jnp.mean(box, axis=0)
    s = jnp.sign(jnp.sum((pts - center) * normals, axis=-1, keepdims=True))
    return pts, normals * jnp.where(s == 0, 1.0, s)


def _box_tris(box: jnp.ndarray) -> jnp.ndarray:
    """(8, 3) -> (12, 3, 3) outward-wound triangles."""
    tris = []
    for q in _QUADS:
        tris.append((q[0], q[1], q[2]))
        tris.append((q[0], q[2], q[3]))
    return box[jnp.asarray(tris)]  # (12, 3, 3)


def _clip_poly_one_plane(verts, count, p0, n, tol):
    """Sutherland-Hodgman: keep region (x - p0).n <= tol.

    verts (CAP, 3), count scalar int. Returns clipped (verts, count).
    A positive tol keeps faces lying ON the clip plane; a negative tol
    drops them — used to count coincident faces of the two boxes once.
    """
    d = jnp.sum((verts - p0) * n, axis=-1)  # (CAP,)
    idx = jnp.arange(_CAP)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    active = idx < count
    cur_in = (d <= tol) & active
    nxt_in = (d[nxt] <= tol) & active
    crossing = active & (cur_in != nxt_in)

    # intersection points on crossing edges
    denom = d - d[nxt]
    t = d / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    inter = verts + t[:, None] * (verts[nxt] - verts)

    emit_cur = cur_in.astype(jnp.int32)
    emit_int = crossing.astype(jnp.int32)
    emits = emit_cur + emit_int
    start = jnp.cumsum(emits) - emits  # exclusive cumsum

    out = jnp.zeros_like(verts)
    pos_cur = jnp.where(cur_in, start, _CAP)
    out = out.at[pos_cur].set(verts, mode="drop")
    pos_int = jnp.where(crossing, start + emit_cur, _CAP)
    out = out.at[pos_int].set(inter, mode="drop")
    return out, jnp.sum(emits)


def _clip_tri_by_box(tri, planes_p, planes_n, tol):
    """tri (3, 3) clipped by 6 half-spaces -> (verts (CAP, 3), count)."""
    verts = jnp.zeros((_CAP, 3), tri.dtype).at[:3].set(tri)
    count = jnp.asarray(3, jnp.int32)

    def step(carry, plane):
        v, c = carry
        p0, n = plane
        v, c = _clip_poly_one_plane(v, c, p0, n, tol)
        return (v, c), None

    (verts, count), _ = jax.lax.scan(
        step, (verts, count), (planes_p, planes_n)
    )
    return verts, count


def _poly_fan_volume(verts, count):
    """Signed divergence-theorem contribution of an outward-wound polygon:
    sum over fan triangles of det[v0, vk, vk+1] / 6."""
    idx = jnp.arange(_CAP)
    k = idx
    valid = (k >= 1) & (k + 1 < count)
    v0 = verts[0]
    a = verts[jnp.clip(k, 0, _CAP - 1)]
    b = verts[jnp.clip(k + 1, 0, _CAP - 1)]
    det = jnp.einsum("i,ki->k", v0, jnp.cross(a, b))
    return jnp.sum(jnp.where(valid, det, 0.0)) / 6.0


def _box_volume(box: jnp.ndarray) -> jnp.ndarray:
    tris = _box_tris(box)
    det = jnp.einsum("ti,ti->t", tris[:, 0], jnp.cross(tris[:, 1], tris[:, 2]))
    return jnp.abs(jnp.sum(det)) / 6.0


def _pair_intersection_volume(box1, box2):
    p2, n2 = _box_planes(box2)
    p1, n1 = _box_planes(box1)

    def faces_volume(box, pp, nn, tol):
        tris = _box_tris(box)  # (12, 3, 3)

        def one(tri):
            v, c = _clip_tri_by_box(tri, pp, nn, tol)
            return _poly_fan_volume(v, c)

        return jnp.sum(jax.vmap(one)(tris))

    # box1 faces keep the shared boundary (tol +eps); box2 faces take the
    # strict interior (tol -eps) so coincident faces are counted once.
    vol = faces_volume(box1, p2, n2, _EPS) + faces_volume(box2, p1, n1, -_EPS)
    return jnp.abs(vol)


def _check_coplanar(boxes: jnp.ndarray, eps: float = 1e-4) -> None:
    faces = jnp.asarray([q for q in _QUADS])
    verts = boxes[:, faces]  # (N, 6, 4, 3)
    v0, v1, v2, v3 = (verts[:, :, i] for i in range(4))
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    d = jnp.abs(jnp.sum((v3 - v0) * n, axis=-1))
    if bool((d > eps).any()):
        raise ValueError("Planes have zero areas")


def _check_nonzero(boxes: jnp.ndarray, eps: float = 1e-8) -> None:
    if bool((jax.vmap(_box_volume)(boxes) < eps).any()):
        raise ValueError("Planes have zero areas")


def box3d_overlap(
    boxes1: jnp.ndarray,  # (N, 8, 3)
    boxes2: jnp.ndarray,  # (M, 8, 3)
    eps: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intersection volume and IoU of all box pairs (reference :114).

    Returns (vol (N, M), iou (N, M)).
    """
    if boxes1.ndim != 3 or boxes1.shape[1:] != (8, 3):
        raise ValueError("boxes1 has to be of shape (N, 8, 3)")
    if boxes2.ndim != 3 or boxes2.shape[1:] != (8, 3):
        raise ValueError("boxes2 has to be of shape (M, 8, 3)")
    _check_coplanar(boxes1, eps)
    _check_coplanar(boxes2, eps)
    _check_nonzero(boxes1)
    _check_nonzero(boxes2)

    vols1 = jax.vmap(_box_volume)(boxes1)  # (N,)
    vols2 = jax.vmap(_box_volume)(boxes2)  # (M,)
    inter = jax.vmap(
        lambda b1: jax.vmap(lambda b2: _pair_intersection_volume(b1, b2))(
            boxes2
        )
    )(boxes1)  # (N, M)
    union = vols1[:, None] + vols2[None, :] - inter
    iou = inter / jnp.clip(union, 1e-12)
    return inter, iou
