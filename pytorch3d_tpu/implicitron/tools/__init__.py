"""Implicitron tools: config, stats, checkpoints, metrics, video (reference implicitron/tools)."""
from . import config, model_io, stats

__all__ = ["config", "model_io", "stats"]
