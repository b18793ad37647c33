"""Misc implicitron tool utilities.

Parity: reference implicitron/tools/utils.py (`Timer` :49,
`cat_dataclass` :125, `dict_to_cuda`/`dict_to_cpu` :107,
`dataclass_to_cuda_`/`dataclass_to_cpu_` :20). Device-transfer helpers
are shims here: JAX arrays are placed by jax.device_put / shardings,
so the *_cuda_/*_cpu_ variants return their input unchanged.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict

from ..models.utils import cat_dataclass  # noqa: F401 (reference :125)


class Timer:
    """Context-manager timer (reference utils.py:49)."""

    def __init__(self, name: str = "timer", quiet: bool = False) -> None:
        self.name = name
        self.quiet = quiet
        self.elapsed = None

    def __enter__(self) -> "Timer":
        self.start = time.time()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.time() - self.start
        if not self.quiet:
            print(f"{self.name} time {self.elapsed:.6f}")


def dataclass_to_cuda_(obj):
    """Device shim (reference :20): placement is managed by
    jax.device_put / shardings; returns obj unchanged."""
    return obj


def dataclass_to_cpu_(obj):
    return obj


def dict_to_cuda(d: Dict[str, Any]) -> Dict[str, Any]:
    """Device shim (reference :107); returns a shallow copy."""
    return dict(d)


def dict_to_cpu(d: Dict[str, Any]) -> Dict[str, Any]:
    return dict(d)
