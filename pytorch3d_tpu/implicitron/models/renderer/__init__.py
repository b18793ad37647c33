"""Implicitron renderers: multipass EA, SDF, LSTM, ray samplers (reference implicitron/models/renderer)."""
from .base import (
    BaseRenderer,
    EvaluationMode,
    ImplicitronRayBundle,
    RendererOutput,
    RenderSamplingMode,
)
from .lstm_renderer import LSTMRenderer
from .multipass_ea import MultiPassEmissionAbsorptionRenderer
from .ray_point_refiner import RayPointRefiner
from .ray_sampler import AdaptiveRaySampler, NearFarRaySampler, RaySamplerBase
from .ray_tracing import RayTracing
from .raymarcher import CumsumRaymarcher, EmissionAbsorptionRaymarcher
from .sdf_renderer import SignedDistanceFunctionRenderer

__all__ = [k for k in dir() if not k.startswith("_")]
