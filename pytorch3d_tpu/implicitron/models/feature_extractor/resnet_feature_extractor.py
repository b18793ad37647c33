"""Image feature extraction backbone.

Parity: reference
implicitron/models/feature_extractor/resnet_feature_extractor.py
(`ResNetFeatureExtractor`: torchvision ResNet pyramid).  torchvision is not
part of the TPU stack; this is a flax ResNet-ish pyramid with the same
interface (dict of multi-scale feature maps + concatenated global code),
trained from scratch or loaded from an orbax checkpoint.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class _ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride))(x)
        y = nn.relu(nn.GroupNorm(num_groups=8)(y))
        y = nn.Conv(self.features, (3, 3))(y)
        y = nn.GroupNorm(num_groups=8)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride)
            )(x)
        return nn.relu(residual + y)


class ResNetFeatureExtractor(nn.Module):
    """Multi-scale conv pyramid (reference interface)."""

    stages: Tuple[int, ...] = (1, 2, 3)
    first_max_pool: bool = True
    image_rescale: float = 1.0
    base_features: int = 32
    add_masks: bool = True
    add_images: bool = True
    normalize_image: bool = True
    global_average_pool: bool = False

    @nn.compact
    def __call__(
        self, image_rgb: jnp.ndarray, masks: Optional[jnp.ndarray] = None
    ) -> Dict[str, jnp.ndarray]:
        """image_rgb (N, H, W, 3) -> {'level_k': (N, C_k, H_k, W_k)}."""
        x = image_rgb
        if self.normalize_image:
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            x = (x - mean) / std
        if masks is not None and self.add_masks:
            x = jnp.concatenate([x, masks], axis=-1)

        out = {}
        if self.add_images:
            out["level_0"] = jnp.moveaxis(image_rgb, -1, 1)

        x = nn.Conv(self.base_features, (7, 7), strides=(2, 2))(x)
        x = nn.relu(nn.GroupNorm(num_groups=8)(x))
        if self.first_max_pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        feats = self.base_features
        for k in range(1, max(self.stages) + 1):
            stride = 1 if k == 1 else 2
            x = _ResBlock(feats, stride=stride)(x)
            x = _ResBlock(feats)(x)
            if k in self.stages:
                out[f"level_{k}"] = jnp.moveaxis(x, -1, 1)  # (N, C, H, W)
            feats *= 2

        if self.global_average_pool:
            out["global_code"] = jnp.mean(
                jnp.moveaxis(x, -1, 1), axis=(2, 3)
            )
        return out
