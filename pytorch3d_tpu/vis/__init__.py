"""Plotly/matplotlib visualization (reference pytorch3d/vis)."""
from .plotly_vis import plot_batch_individually, plot_scene
from .texture_vis import texturesuv_image_matplotlib

__all__ = [k for k in dir() if not k.startswith("_")]
