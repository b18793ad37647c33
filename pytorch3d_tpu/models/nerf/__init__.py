"""NeRF model family: raysamplers, implicit MLP, renderer (reference projects/nerf)."""
from .implicit_function import MLPWithInputSkips, NeuralRadianceField
from .nerf_renderer import RadianceFieldRenderer
from .raymarcher import EmissionAbsorptionNeRFRaymarcher
from .raysampler import NeRFRaysampler, ProbabilisticRaysampler

__all__ = [k for k in dir() if not k.startswith("_")]
