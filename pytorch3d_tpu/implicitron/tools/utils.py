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


def try_to_cuda(t: Any) -> Any:
    """Device shim (reference utils.py:31); JAX placement is explicit,
    returns input unchanged."""
    return t


def try_to_cpu(t: Any) -> Any:
    return t


def evaluating(net):
    """Temporarily switch to evaluation mode (reference utils.py:20).
    Flax modules are stateless — evaluation mode is an argument of
    apply, so this is a no-op context manager yielding the module."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        yield net

    return _ctx()


def recursive_visitor(it):
    """Depth-first iteration over nested iterables (reference
    utils.py:164)."""
    from collections.abc import Iterable

    for x in it:
        if isinstance(x, Iterable) and not isinstance(x, (str, bytes)):
            yield from recursive_visitor(x)
        else:
            yield x


def get_inlier_indicators(tensor, dim: int, outlier_rate: float):
    """Boolean keep-mask along `dim` dropping the outlier_rate fraction
    of extreme values, half from each tail (reference utils.py:172)."""
    import jax.numpy as jnp
    import numpy as np

    tensor = jnp.asarray(tensor)
    remove_elements = int(min(outlier_rate, 1.0) * tensor.shape[dim] / 2)
    if remove_elements == 0:
        return jnp.ones((tensor.shape[dim],), bool)
    moved = jnp.moveaxis(tensor, dim, -1).reshape(-1, tensor.shape[dim])
    hi = jnp.argsort(-moved, axis=-1)[..., :remove_elements]
    lo = jnp.argsort(moved, axis=-1)[..., :remove_elements]
    remove = set(np.asarray(hi).reshape(-1).tolist()) | set(
        np.asarray(lo).reshape(-1).tolist()
    )
    keep = np.ones((tensor.shape[dim],), bool)
    keep[list(remove)] = False
    return jnp.asarray(keep)
