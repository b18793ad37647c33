from .renderer import Renderer
from .unified import PulsarPointsRenderer

__all__ = ["Renderer", "PulsarPointsRenderer"]
