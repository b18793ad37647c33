"""Point compositing module (reference renderer/compositing.py).

The functions live in renderer/points/compositing.py in this package;
this module mirrors the reference file layout.
"""

from .points.compositing import (  # noqa: F401
    alpha_composite,
    norm_weighted_sum,
    weighted_sum,
)
