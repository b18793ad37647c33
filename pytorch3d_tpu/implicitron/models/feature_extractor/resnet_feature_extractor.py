"""Image feature extraction backbone.

Parity: reference
implicitron/models/feature_extractor/resnet_feature_extractor.py:38
(`ResNetFeatureExtractor`: torchvision ResNet pyramid with per-stage
1x1 projections, l2 normalization, and image/feature rescaling).

TPU design: a faithful flax ResNet (18/34/50 stage layouts, frozen
BatchNorm folded into parameters so the module stays a pure function —
the reference runs its pretrained backbone with eval-mode BN in the
standard pipelines).  torchvision isn't part of the TPU stack, so
`pretrained=True` is honoured by importing a locally-available torch
``state_dict`` via `params_from_torch_state_dict` (no network access is
assumed); otherwise the backbone trains from scratch or loads from an
orbax checkpoint.

Feature maps are returned channel-first `(N, C, H, W)` keyed
`res_layer_{k}` / `mask` / `image`, matching the reference's output
contract (reference :141, :224).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn

import jax
import jax.numpy as jnp

from ...tools.config import registry
from .feature_extractor import FeatureExtractorBase

MASK_FEATURE_NAME = "mask"
IMAGE_FEATURE_NAME = "image"

_FEAT_DIMS = {
    "resnet18": (64, 128, 256, 512),
    "resnet34": (64, 128, 256, 512),
    "resnet50": (256, 512, 1024, 2048),
    "resnet101": (256, 512, 1024, 2048),
    "resnet152": (256, 512, 1024, 2048),
}
# (blocks per stage, bottleneck?)
_LAYOUTS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


class FrozenBatchNorm(nn.Module):
    """BatchNorm in inference form with (scale, bias, mean, var) as plain
    parameters — the functional equivalent of the reference's eval-mode
    pretrained BN; importable 1:1 from a torch state_dict."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-relu-3x3-BN + identity/1x1 skip."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        s = (self.stride, self.stride)
        y = nn.Conv(self.features, (3, 3), strides=s, use_bias=False,
                    name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.features, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=s, use_bias=False,
                        name="downsample_conv")(x)
            x = FrozenBatchNorm(self.features, name="downsample_bn")(x)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + skip."""

    features: int  # output features (4x the bottleneck width)
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        width = self.features // 4
        s = (self.stride, self.stride)
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(width, name="bn1")(y))
        y = nn.Conv(width, (3, 3), strides=s, use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(width, name="bn2")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(self.features, name="bn3")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=s, use_bias=False,
                        name="downsample_conv")(x)
            x = FrozenBatchNorm(self.features, name="downsample_bn")(x)
        return nn.relu(x + y)


@registry.register
class ResNetFeatureExtractor(nn.Module, FeatureExtractorBase):
    """Multi-scale ResNet feature pyramid (reference :38 settings).

    Settings (mirroring the reference field-for-field; the reference's
    `name` field is spelled `arch` here because flax reserves
    `Module.name` for the module path):
        arch: resnet backbone variant (resnet18/34/50/101/152 layouts).
        pretrained: kept for config parity; weights are imported with
            `params_from_torch_state_dict` rather than downloaded.
        stages: stages whose features are emitted as `res_layer_{k}`.
        normalize_image: subtract/divide the ImageNet RGB mean/std.
        image_rescale: bilinear input resize factor (reference :175).
        first_max_pool: max-pool after the stem conv (reference :101).
        proj_dim: per-stage 1x1 projection width (0/negative = identity;
            stages whose native width <= proj_dim stay identity,
            reference :113-126).
        l2_norm: per-stage L2 feature normalization scaled by
            1/sqrt(len(stages)) (reference :206).
        add_masks / add_images: pass-through `mask` / `image` entries.
        global_average_pool: spatial mean per emitted stage.
        feature_rescale: scalar multiplier on every output (ref :220).
    """

    arch: str = "resnet34"
    pretrained: bool = True
    stages: Tuple[int, ...] = (1, 2, 3, 4)
    normalize_image: bool = True
    image_rescale: float = 128 / 800.0
    first_max_pool: bool = True
    proj_dim: int = 32
    l2_norm: bool = True
    add_masks: bool = True
    add_images: bool = True
    global_average_pool: bool = False
    feature_rescale: float = 1.0

    def get_feat_dims(self) -> int:
        """Total channel count over all emitted entries (reference :151)."""
        dims = 0
        for stage in self.stages:
            native = _FEAT_DIMS[self.arch][stage - 1]
            dims += (
                self.proj_dim
                if 0 < self.proj_dim < native
                else native
            )
        if self.add_masks:
            dims += 1
        if self.add_images:
            dims += 3
        return dims

    @nn.compact
    def __call__(
        self,
        image_rgb: Optional[jnp.ndarray],  # (N, H, W, 3) channels-last
        masks: Optional[jnp.ndarray] = None,  # (N, H, W, 1)
    ) -> Dict[str, jnp.ndarray]:
        """Returns {name: (N, C_i, H_i, W_i)} feature maps."""
        out: Dict[str, jnp.ndarray] = {}

        imgs_resized = image_rgb
        if image_rgb is not None and self.image_rescale != 1.0:
            n, h, w, c = image_rgb.shape
            nh = max(int(round(h * self.image_rescale)), 1)
            nw = max(int(round(w * self.image_rescale)), 1)
            imgs_resized = jax.image.resize(
                image_rgb, (n, nh, nw, c), method="bilinear"
            )

        if len(self.stages) > 0:
            assert imgs_resized is not None
            x = imgs_resized
            if self.normalize_image:
                x = (x - jnp.asarray(_RESNET_MEAN)) / jnp.asarray(_RESNET_STD)

            # stem: 7x7/2 conv + BN + relu (+ 3x3/2 max pool)
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name="stem_conv")(x)
            x = nn.relu(FrozenBatchNorm(64, name="stem_bn")(x))
            if self.first_max_pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])

            layout, bottleneck = _LAYOUTS[self.arch]
            block_cls = Bottleneck if bottleneck else BasicBlock
            max_stage = max(self.stages)
            for stage in range(1, max_stage + 1):
                feats = _FEAT_DIMS[self.arch][stage - 1]
                for b in range(layout[stage - 1]):
                    stride = 2 if (stage > 1 and b == 0) else 1
                    x = block_cls(feats, stride=stride,
                                  name=f"layer{stage}_block{b}")(x)
                if stage in self.stages:
                    f = x
                    native = _FEAT_DIMS[self.arch][stage - 1]
                    if 0 < self.proj_dim < native:
                        f = nn.Conv(self.proj_dim, (1, 1), use_bias=True,
                                    name=f"proj{stage}")(f)
                    f = jnp.moveaxis(f, -1, 1)  # (N, C, H, W)
                    if self.global_average_pool:
                        f = jnp.mean(f, axis=(2, 3))
                    if self.l2_norm:
                        normfac = 1.0 / math.sqrt(len(self.stages))
                        f = (
                            f
                            / jnp.clip(
                                jnp.linalg.norm(f, axis=1, keepdims=True),
                                1e-12,
                            )
                            * normfac
                        )
                    out[f"res_layer_{stage}"] = f

        if self.add_masks and masks is not None:
            out[MASK_FEATURE_NAME] = jnp.moveaxis(masks, -1, 1)
        if self.add_images:
            assert imgs_resized is not None
            out[IMAGE_FEATURE_NAME] = jnp.moveaxis(imgs_resized, -1, 1)

        if self.feature_rescale != 1.0:
            out = {k: self.feature_rescale * f for k, f in out.items()}
        return out


def params_from_torch_state_dict(
    params: Dict[str, Any], state_dict: Dict[str, Any], arch: str = "resnet34"
) -> Dict[str, Any]:
    """Import torchvision ResNet weights into this module's param tree.

    `state_dict` maps torchvision names (``conv1.weight``,
    ``layer{s}.{b}.conv{i}.weight``, ``...bn{i}.{weight,bias,
    running_mean,running_var}``, ``...downsample.{0,1}.*``) to numpy/torch
    arrays; conv kernels are transposed OIHW -> HWIO.  Entries absent from
    the tree (deeper stages than `max(stages)`, fc) are ignored.

    Returns a new params dict (does not mutate the input)."""
    import numpy as np

    def conv(w):
        return jnp.asarray(np.asarray(w)).transpose(2, 3, 1, 0)

    def vec(w):
        return jnp.asarray(np.asarray(w))

    import flax

    new = flax.core.unfreeze(
        jax.tree_util.tree_map(lambda x: x, params)  # rebuild (copy) tree
    )
    tree = new["params"] if "params" in new else new

    def put(mod, leaf, value):
        if mod in tree and leaf in tree[mod]:
            if tree[mod][leaf].shape != value.shape:
                raise ValueError(
                    f"{mod}.{leaf}: shape {value.shape} != "
                    f"{tree[mod][leaf].shape}"
                )
            tree[mod][leaf] = value

    put("stem_conv", "kernel", conv(state_dict["conv1.weight"]))
    for t_leaf, j_leaf in (
        ("weight", "scale"), ("bias", "bias"),
        ("running_mean", "mean"), ("running_var", "var"),
    ):
        put("stem_bn", j_leaf, vec(state_dict[f"bn1.{t_leaf}"]))

    layout, bottleneck = _LAYOUTS[arch]
    n_convs = 3 if bottleneck else 2
    for stage in range(1, 5):
        for b in range(layout[stage - 1]):
            mod = f"layer{stage}_block{b}"
            tv = f"layer{stage}.{b}"
            if mod not in tree:
                continue
            for i in range(1, n_convs + 1):
                key = f"{tv}.conv{i}.weight"
                if key in state_dict and f"conv{i}" in tree[mod]:
                    tree[mod][f"conv{i}"]["kernel"] = conv(state_dict[key])
                for t_leaf, j_leaf in (
                    ("weight", "scale"), ("bias", "bias"),
                    ("running_mean", "mean"), ("running_var", "var"),
                ):
                    bkey = f"{tv}.bn{i}.{t_leaf}"
                    if bkey in state_dict and f"bn{i}" in tree[mod]:
                        tree[mod][f"bn{i}"][j_leaf] = vec(state_dict[bkey])
            dkey = f"{tv}.downsample.0.weight"
            if dkey in state_dict and "downsample_conv" in tree[mod]:
                tree[mod]["downsample_conv"]["kernel"] = conv(
                    state_dict[dkey]
                )
                for t_leaf, j_leaf in (
                    ("weight", "scale"), ("bias", "bias"),
                    ("running_mean", "mean"), ("running_var", "var"),
                ):
                    tree[mod]["downsample_bn"][j_leaf] = vec(
                        state_dict[f"{tv}.downsample.1.{t_leaf}"]
                    )
    return new
