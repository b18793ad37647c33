"""OFF mesh format (reference io/off_io.py:385 `MeshOffFormat`)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def load_off(f) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Load an OFF file -> (verts (V, 3), faces (F, 3) fan-triangulated)."""
    if hasattr(f, "read"):
        text = f.read()
        if isinstance(text, bytes):
            text = text.decode("ascii")
    else:
        with open(str(f), "r") as fh:
            text = fh.read()
    lines = [
        ln.split("#")[0].strip()
        for ln in text.splitlines()
    ]
    lines = [ln for ln in lines if ln]
    first = lines[0]
    if first.startswith("OFF"):
        rest = first[3:].strip()
        lines = ([rest] if rest else []) + lines[1:]
    counts = lines[0].split()
    nv, nf = int(counts[0]), int(counts[1])
    verts = np.asarray(
        [[float(x) for x in ln.split()[:3]] for ln in lines[1 : 1 + nv]],
        np.float32,
    )
    faces = []
    for ln in lines[1 + nv : 1 + nv + nf]:
        tokens = ln.split()
        n = int(tokens[0])
        poly = [int(t) for t in tokens[1 : 1 + n]]
        for k in range(n - 2):
            faces.append((poly[0], poly[k + 1], poly[k + 2]))
    return jnp.asarray(verts), jnp.asarray(np.asarray(faces, np.int32).reshape(-1, 3))


def save_off(f, verts, faces) -> None:
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    with open(str(f), "w") as fh:
        fh.write("OFF\n")
        fh.write(f"{verts.shape[0]} {faces.shape[0]} 0\n")
        for v in verts:
            fh.write(" ".join(f"{x:.6f}" for x in v) + "\n")
        for face in faces:
            fh.write("3 " + " ".join(str(int(x)) for x in face) + "\n")
