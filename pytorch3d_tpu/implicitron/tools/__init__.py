from . import config, model_io, stats

__all__ = ["config", "model_io", "stats"]
