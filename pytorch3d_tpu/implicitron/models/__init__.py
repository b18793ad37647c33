"""Implicitron models: GenericModel, renderers, implicit functions (reference implicitron/models)."""
from .generic_model import GenericModel
from .metrics import RegularizationMetrics, ViewMetrics
from .overfit_model import ModelDBIR, OverfitModel

__all__ = [k for k in dir() if not k.startswith("_")]
