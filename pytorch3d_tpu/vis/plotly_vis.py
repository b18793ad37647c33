"""Scene visualization.

Parity: reference vis/plotly_vis.py (`plot_scene` :106,
`plot_batch_individually` :413 — traces for meshes / pointclouds / cameras
/ RayBundles).

plotly is not installed in this environment; when available the functions
build plotly figures with the same trace structure, otherwise they fall
back to matplotlib 3D axes (same API, returns the figure object).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np

try:  # pragma: no cover - environment dependent
    import plotly.graph_objects as go

    _HAS_PLOTLY = True
except ImportError:
    go = None
    _HAS_PLOTLY = False


def _mesh_arrays(mesh, index: int = 0):
    nv = int(mesh.num_verts_per_mesh()[index])
    nf = int(mesh.num_faces_per_mesh()[index])
    verts = np.asarray(mesh.verts_padded()[index][:nv])
    faces = np.asarray(mesh.faces_padded()[index][:nf])
    return verts, faces


def _pointcloud_arrays(pcl, index: int = 0):
    n = int(pcl.num_points_per_cloud()[index])
    return np.asarray(pcl.points_padded()[index][:n])


class AxisArgs(NamedTuple):
    """Plotly axis display options (reference plotly_vis.py:85)."""

    showgrid: bool = False
    zeroline: bool = False
    showline: bool = False
    ticks: str = ""
    showticklabels: bool = False
    backgroundcolor: str = "#fff"
    showaxeslabels: bool = False


class Lighting(NamedTuple):
    """Plotly mesh lighting options (reference plotly_vis.py:95)."""

    ambient: float = 0.8
    diffuse: float = 1.0
    fresnel: float = 0.0
    specular: float = 0.0
    roughness: float = 0.5
    facenormalsepsilon: float = 1e-6
    vertexnormalsepsilon: float = 1e-12


def get_camera_wireframe(scale: float = 0.3):
    """The reference's camera-symbol wireframe points, (15, 3)
    (reference plotly_vis.py:68)."""
    import jax.numpy as jnp

    a = 0.5 * np.asarray([-2, 1.5, 4], np.float32)
    up1 = 0.5 * np.asarray([0, 1.5, 4], np.float32)
    up2 = 0.5 * np.asarray([0, 2, 4], np.float32)
    b = 0.5 * np.asarray([2, 1.5, 4], np.float32)
    c = 0.5 * np.asarray([-2, -1.5, 4], np.float32)
    d = 0.5 * np.asarray([2, -1.5, 4], np.float32)
    C = np.zeros(3, np.float32)
    F = np.asarray([0, 0, 3], np.float32)
    pts = np.stack([a, up1, up2, up1, b, d, c, a, C, b, d, C, c, C, F])
    return jnp.asarray(pts * scale)


def _camera_wireframe(cameras, index: int = 0, scale: float = 0.3):
    """Camera frustum wireframe points (reference camera trace)."""
    import jax.numpy as jnp

    corners = (
        np.asarray(
            [
                [0, 0, 0], [1, 1, 2], [1, -1, 2], [0, 0, 0],
                [-1, -1, 2], [-1, 1, 2], [0, 0, 0], [1, -1, 2],
                [-1, -1, 2], [0, 0, 0], [-1, 1, 2], [1, 1, 2],
            ],
            np.float32,
        )
        * scale
    )
    w2v = cameras.get_world_to_view_transform()
    pts = w2v.inverse().transform_points(jnp.asarray(corners)[None])
    return np.asarray(pts[min(index, pts.shape[0] - 1)])


def _ray_bundle_arrays(rb, index: int = 0, n_rays: int = 64):
    import numpy as np

    o = np.asarray(rb.origins[index]).reshape(-1, 3)[:n_rays]
    d = np.asarray(rb.directions[index]).reshape(-1, 3)[:n_rays]
    l = np.asarray(rb.lengths[index]).reshape(o.shape[0], -1) if hasattr(rb, "lengths") else None
    far = l.max(axis=1, keepdims=True) if l is not None else 1.0
    return o, o + d * far


def plot_scene(
    plots: Dict[str, Dict[str, object]],
    *,
    viewpoint_cameras=None,
    ncols: int = 1,
    **kwargs,
):
    """Plot a dict of {subplot: {trace_name: object}} (reference :106).

    Objects may be Meshes, Pointclouds, cameras, or ray bundles. Returns a
    plotly Figure when plotly is available, else a matplotlib Figure.
    """
    if _HAS_PLOTLY:
        return _plot_scene_plotly(plots, ncols=ncols, **kwargs)
    return _plot_scene_matplotlib(plots, ncols=ncols, **kwargs)


def _classify(obj):
    if hasattr(obj, "faces_padded"):
        return "mesh"
    if hasattr(obj, "points_padded"):
        return "pointcloud"
    if hasattr(obj, "get_world_to_view_transform"):
        return "camera"
    if hasattr(obj, "origins"):
        return "raybundle"
    raise ValueError(f"cannot plot object of type {type(obj)}")


def _plot_scene_matplotlib(plots, ncols=1, **kwargs):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(plots)
    nrows = -(-n // ncols)
    fig = plt.figure(figsize=(5 * ncols, 5 * nrows))
    for i, (title, traces) in enumerate(plots.items()):
        ax = fig.add_subplot(nrows, ncols, i + 1, projection="3d")
        ax.set_title(title)
        for name, obj in traces.items():
            kind = _classify(obj)
            if kind == "mesh":
                verts, faces = _mesh_arrays(obj)
                ax.plot_trisurf(
                    verts[:, 0], verts[:, 1], verts[:, 2],
                    triangles=faces, alpha=0.5,
                )
            elif kind == "pointcloud":
                pts = _pointcloud_arrays(obj)
                ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, label=name)
            elif kind == "camera":
                wf = _camera_wireframe(obj)
                ax.plot(wf[:, 0], wf[:, 1], wf[:, 2], label=name)
            elif kind == "raybundle":
                starts, ends = _ray_bundle_arrays(obj)
                for s, e in zip(starts, ends):
                    ax.plot([s[0], e[0]], [s[1], e[1]], [s[2], e[2]],
                            linewidth=0.3, color="gray")
    return fig


def _plot_scene_plotly(plots, ncols=1, **kwargs):  # pragma: no cover
    from plotly.subplots import make_subplots

    n = len(plots)
    nrows = -(-n // ncols)
    fig = make_subplots(
        rows=nrows, cols=ncols,
        specs=[[{"type": "scene"}] * ncols for _ in range(nrows)],
        subplot_titles=list(plots.keys()),
    )
    for i, (title, traces) in enumerate(plots.items()):
        row, col = i // ncols + 1, i % ncols + 1
        for name, obj in traces.items():
            kind = _classify(obj)
            if kind == "mesh":
                verts, faces = _mesh_arrays(obj)
                fig.add_trace(
                    go.Mesh3d(
                        x=verts[:, 0], y=verts[:, 1], z=verts[:, 2],
                        i=faces[:, 0], j=faces[:, 1], k=faces[:, 2],
                        name=name,
                    ),
                    row=row, col=col,
                )
            elif kind == "pointcloud":
                pts = _pointcloud_arrays(obj)
                fig.add_trace(
                    go.Scatter3d(
                        x=pts[:, 0], y=pts[:, 1], z=pts[:, 2],
                        mode="markers", marker={"size": 2}, name=name,
                    ),
                    row=row, col=col,
                )
            elif kind == "camera":
                wf = _camera_wireframe(obj)
                fig.add_trace(
                    go.Scatter3d(
                        x=wf[:, 0], y=wf[:, 1], z=wf[:, 2],
                        mode="lines", name=name,
                    ),
                    row=row, col=col,
                )
            elif kind == "raybundle":
                starts, ends = _ray_bundle_arrays(obj)
                xs, ys, zs = [], [], []
                for s, e in zip(starts, ends):
                    xs += [s[0], e[0], None]
                    ys += [s[1], e[1], None]
                    zs += [s[2], e[2], None]
                fig.add_trace(
                    go.Scatter3d(x=xs, y=ys, z=zs, mode="lines", name=name),
                    row=row, col=col,
                )
    return fig


def plot_batch_individually(
    batched_structs, *, ncols: int = 1, extend_struct: bool = True, **kwargs
):
    """One subplot per batch element (reference :413)."""
    structs = (
        batched_structs if isinstance(batched_structs, list) else [batched_structs]
    )
    n = max(len(s) for s in structs)
    plots = {}
    for i in range(n):
        traces = {}
        for j, s in enumerate(structs):
            if i < len(s):
                traces[f"trace{j}"] = s[i] if hasattr(s, "__getitem__") else s
        plots[f"{i}"] = traces
    return plot_scene(plots, ncols=ncols, **kwargs)
