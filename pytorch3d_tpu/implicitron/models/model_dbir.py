"""ModelDBIR module (reference implicitron/models/model_dbir.py).

The class lives in overfit_model.py in this package; this module
mirrors the reference file layout.
"""

from .overfit_model import ModelDBIR  # noqa: F401
