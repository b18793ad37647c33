"""Dataset map provider module.

Parity: reference implicitron/dataset/dataset_map_provider.py
(`DatasetMap` :22, `DatasetMapProviderBase` :57, `PathManagerFactory`
:97). `DatasetMap`/`DatasetMapProviderBase` live in dataset_base.py in
this package; this module mirrors the reference layout and adds the
path-manager factory.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

from ..tools.config import Configurable, registry
from .dataset_base import DatasetBase, DatasetMap, DatasetMapProviderBase  # noqa: F401


@dataclasses.dataclass
class PathManagerFactory(Configurable):
    """Constructs the path manager used to resolve dataset paths
    (reference dataset_map_provider.py:97). The reference optionally
    builds an iopath PathManager; iopath is not part of this
    environment, so `get()` returns a minimal local-filesystem manager
    (or None when `silence_logs` requests the trivial path)."""

    silence_logs: bool = True

    def get(self) -> Optional["_LocalPathManager"]:
        return _LocalPathManager()


class _LocalPathManager:
    """Local-filesystem PathManager with the iopath surface used by the
    dataset code."""

    def get_local_path(self, path: str) -> str:
        return str(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def open(self, path: str, mode: str = "r", **kwargs):
        return open(path, mode, **kwargs)
