"""Device normalization (reference common/datatypes.py:17).

JAX manages placement via jax.devices()/shardings, so `Device` maps to a
jax.Device; `make_device` accepts the torch-style strings for API parity.
"""

from __future__ import annotations

from typing import Optional, Union

import jax

Device = Union[str, "jax.Device"]


def make_device(device: Device = "cpu"):
    """'cpu' | 'cuda' | 'cuda:N' | 'tpu' | jax.Device -> jax.Device."""
    if not isinstance(device, str):
        return device
    kind = device.split(":")[0]
    idx = int(device.split(":")[1]) if ":" in device else 0
    if kind == "cuda":  # torch naming parity: map to the accelerator
        kind = jax.default_backend()
    devices = jax.devices(kind) if kind else jax.devices()
    return devices[min(idx, len(devices) - 1)]


def get_device(x, device: Optional[Device] = None):
    if device is not None:
        return make_device(device)
    try:
        return list(x.devices())[0]
    except AttributeError:
        return jax.devices()[0]
