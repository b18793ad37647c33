"""Model zoo entry points (NeRF project re-export)."""
from .nerf.implicit_function import MLPWithInputSkips, NeuralRadianceField
from .nerf.nerf_renderer import RadianceFieldRenderer

__all__ = [k for k in dir() if not k.startswith("_")]
