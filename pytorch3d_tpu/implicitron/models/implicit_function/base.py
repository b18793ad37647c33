"""Implicit function plugin base (reference
implicitron/models/implicit_function/base.py:17)."""

from __future__ import annotations

from ...tools.config import ReplaceableBase


class ImplicitFunctionBase(ReplaceableBase):
    """Callable (ray_bundle) -> (densities (..., S, 1), features (..., S, C)).

    Implementations holding parameters are flax.linen Modules; the config
    system instantiates them from `implicit_function_<Impl>_args`.
    """
