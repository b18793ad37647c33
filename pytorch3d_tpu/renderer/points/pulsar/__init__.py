"""Pulsar sphere renderer + unified interface (reference renderer/points/pulsar)."""
from .renderer import Renderer
from .unified import PulsarPointsRenderer

__all__ = ["Renderer", "PulsarPointsRenderer"]
