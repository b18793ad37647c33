"""SceneBatchSampler module (reference
implicitron/dataset/scene_batch_sampler.py:22).

The class lives in data_loader_map_provider.py in this package; this
module mirrors the reference file layout.
"""

from .data_loader_map_provider import SceneBatchSampler  # noqa: F401
