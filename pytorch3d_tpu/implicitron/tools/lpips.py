"""LPIPS-style perceptual distance with a fixed random feature pyramid.

The reference evaluation (evaluate_new_view_synthesis.py:147) scores
`lpips` with a pretrained AlexNet-based LPIPS model.  Pretrained torch
weights are unavailable in this environment, so this module ships a
DOCUMENTED SUBSTITUTE: a multi-scale convolutional feature pyramid with
frozen, seed-fixed random weights, channel-unit-normalized activations,
and per-layer mean squared feature differences — the LPIPS recipe of
Zhang et al. (2018) minus the learned linear calibration.  Randomly
initialized deep features are a known reasonable perceptual metric
(Zhang et al. report untrained nets beat pixel metrics); scores are
deterministic and comparable across runs of this library, but NOT
numerically comparable to AlexNet-LPIPS values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_WIDTHS = (16, 32, 64, 64)
_SEED = 1879


@functools.lru_cache(maxsize=1)
def _kernels():
    key = jax.random.PRNGKey(_SEED)
    kernels = []
    cin = 3
    for w in _WIDTHS:
        key, k, kb = jax.random.split(key, 3)
        fan_in = 3 * 3 * cin
        kernels.append(
            (
                jax.random.normal(k, (3, 3, cin, w), jnp.float32)
                * (2.0 / fan_in) ** 0.5,
                # Biases matter: a bias-free conv+relu stack is positively
                # homogeneous, so unit-normalized features are invariant to
                # global contrast changes (validated in
                # benchmarks/validate_lpips.py — pre-bias the contrast
                # family ordered at Spearman 0.4).
                0.1 * jax.random.normal(kb, (w,), jnp.float32),
            )
        )
        cin = w
    return tuple(kernels)


def _features(im: jnp.ndarray):
    """(N, H, W, 3) in [-1, 1] -> list of unit-normalized feature maps."""
    feats = []
    x = im
    for i, (k, b) in enumerate(_kernels()):
        x = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x) if i < len(_WIDTHS) - 1 else x
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-10
        feats.append(x / norm)
        if i < len(_WIDTHS) - 1:
            # 2x average-pool between scales
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    return feats


class LPIPSSubstitute:
    """Callable matching the reference lpips_model interface:
    `forward(im1, im2)` with (N, 3, H, W) [-1, 1] inputs -> scalar per
    batch (mean over samples).

    `is_substitute = True` marks this model so `eval_batch` writes its
    scores under `lpips_substitute_*` keys (never `lpips_*`) and tags
    `meta["lpips_metric"]` — consumers cannot mistake it for
    AlexNet-LPIPS.  Validation: benchmarks/validate_lpips.py →
    LPIPS_VALIDATION.json (distortion-severity monotonicity + rank
    correlation against PSNR/SSIM)."""

    is_substitute = True
    metric_name = "random-feature-substitute"

    def forward(self, im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
        if im1.ndim != 4:
            raise ValueError("expected (N, 3, H, W) images")
        if im1.shape[1] == 3:  # channels-first like the torch interface
            im1 = jnp.moveaxis(im1, 1, -1)
            im2 = jnp.moveaxis(im2, 1, -1)
        f1 = _features(im1)
        f2 = _features(im2)
        dists = [
            jnp.mean(jnp.sum((a - b) ** 2, axis=-1)) for a, b in zip(f1, f2)
        ]
        return jnp.mean(jnp.stack(dists))

    __call__ = forward
