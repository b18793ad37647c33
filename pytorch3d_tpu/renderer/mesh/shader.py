"""Shaders (parity: reference renderer/mesh/shader.py)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..blending import (
    BlendParams,
    hard_rgb_blend,
    sigmoid_alpha_blend,
    softmax_rgb_blend,
)
from ..lighting import PointLights
from ..materials import Materials
from .shading import flat_shading, gouraud_shading, phong_shading


class ShaderBase:
    def __init__(
        self,
        cameras=None,
        lights=None,
        materials: Optional[Materials] = None,
        blend_params: Optional[BlendParams] = None,
    ):
        self.lights = lights if lights is not None else PointLights.create()
        self.materials = materials if materials is not None else Materials.create()
        self.cameras = cameras
        self.blend_params = blend_params if blend_params is not None else BlendParams()

    def _get_cameras(self, **kwargs):
        cameras = kwargs.get("cameras", self.cameras)
        if cameras is None:
            raise ValueError(
                f"Cameras must be specified either at initialization or in the "
                f"forward pass of {type(self).__name__}"
            )
        return cameras

    def __call__(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        return self.forward(fragments, meshes, **kwargs)


class HardPhongShader(ShaderBase):
    """Per-pixel Phong lighting, hard (closest-face) blending (ref :81)."""

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        cameras = self._get_cameras(**kwargs)
        texels = meshes.sample_textures(fragments)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        colors = phong_shading(
            meshes=meshes, fragments=fragments, texels=texels,
            lights=lights, cameras=cameras, materials=materials,
        )
        return hard_rgb_blend(colors, fragments, blend_params)


class SoftPhongShader(ShaderBase):
    """Per-pixel Phong lighting, softmax blending (ref :113)."""

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        cameras = self._get_cameras(**kwargs)
        texels = meshes.sample_textures(fragments)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        colors = phong_shading(
            meshes=meshes, fragments=fragments, texels=texels,
            lights=lights, cameras=cameras, materials=materials,
        )
        znear = kwargs.get("znear", getattr(cameras, "znear", 1.0))
        zfar = kwargs.get("zfar", getattr(cameras, "zfar", 100.0))
        return softmax_rgb_blend(
            colors, fragments, blend_params, znear=znear, zfar=zfar
        )


class HardGouraudShader(ShaderBase):
    """Per-vertex lighting, hard blending (ref :149)."""

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        cameras = self._get_cameras(**kwargs)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        pixel_colors = gouraud_shading(
            meshes=meshes, fragments=fragments,
            lights=lights, cameras=cameras, materials=materials,
        )
        return hard_rgb_blend(pixel_colors, fragments, blend_params)


class SoftGouraudShader(ShaderBase):
    """Per-vertex lighting, softmax blending (ref :186)."""

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        cameras = self._get_cameras(**kwargs)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        pixel_colors = gouraud_shading(
            meshes=meshes, fragments=fragments,
            lights=lights, cameras=cameras, materials=materials,
        )
        znear = kwargs.get("znear", getattr(cameras, "znear", 1.0))
        zfar = kwargs.get("zfar", getattr(cameras, "zfar", 100.0))
        return softmax_rgb_blend(
            pixel_colors, fragments, blend_params, znear=znear, zfar=zfar
        )


class HardFlatShader(ShaderBase):
    """Per-face lighting, hard blending (ref :245)."""

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        cameras = self._get_cameras(**kwargs)
        texels = meshes.sample_textures(fragments)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        colors = flat_shading(
            meshes=meshes, fragments=fragments, texels=texels,
            lights=lights, cameras=cameras, materials=materials,
        )
        return hard_rgb_blend(colors, fragments, blend_params)


class SoftSilhouetteShader:
    """Alpha-only silhouette via sigmoid blending (ref :277)."""

    def __init__(self, blend_params: Optional[BlendParams] = None):
        self.blend_params = blend_params if blend_params is not None else BlendParams()

    def __call__(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        return self.forward(fragments, meshes, **kwargs)

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        colors = jnp.ones_like(fragments.bary_coords)
        blend_params = kwargs.get("blend_params", self.blend_params)
        return sigmoid_alpha_blend(colors, fragments, blend_params)


class HardDepthShader(ShaderBase):
    """Closest-face depth; background = zfar (ref :377)."""

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        cameras = self._get_cameras(**kwargs)
        zfar = kwargs.get("zfar", getattr(cameras, "zfar", 100.0))
        zbuf = fragments.zbuf[..., 0:1]
        mask = fragments.pix_to_face[..., 0:1] < 0
        # a batched camera carries zfar of shape (N,): align it with the
        # (N, H, W, 1) image axes, else it broadcasts into the channels
        zfar = jnp.reshape(
            jnp.asarray(zfar, zbuf.dtype), (-1,) + (1,) * (zbuf.ndim - 1)
        )
        return jnp.where(mask, zfar, zbuf)


class SoftDepthShader(ShaderBase):
    """Sigmoid-weighted expected depth (ref :403)."""

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        cameras = self._get_cameras(**kwargs)
        zfar = kwargs.get("zfar", getattr(cameras, "zfar", 100.0))
        blend_params = kwargs.get("blend_params", self.blend_params)
        mask = fragments.pix_to_face >= 0
        prob = jax.nn.sigmoid(-fragments.dists / blend_params.sigma) * mask
        alpha = 1.0 - jnp.prod(1.0 - prob, axis=-1, keepdims=True)
        weights = prob / jnp.maximum(jnp.sum(prob, axis=-1, keepdims=True), 1e-10)
        depth = jnp.sum(weights * fragments.zbuf, axis=-1, keepdims=True)
        bg = jnp.reshape(
            jnp.asarray(zfar, depth.dtype), (-1,) + (1,) * (depth.ndim - 1)
        )
        return depth * alpha + bg * (1.0 - alpha)



class SplatterPhongShader(ShaderBase):
    """Phong shading + splatter blending (reference shader.py:309).

    Designed to pair with a non-differentiable rasterization step: screen
    positions are recomputed differentiably from barycentrics and splatted
    (renderer/splatter_blend.py).
    """

    def forward(self, fragments, meshes, **kwargs) -> jnp.ndarray:
        from ..splatter_blend import (
            SplatterBlender,
            pixel_coords_screen_from_fragments,
        )

        cameras = self._get_cameras(**kwargs)
        texels = meshes.sample_textures(fragments)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        colors = phong_shading(
            meshes=meshes, fragments=fragments, texels=texels,
            lights=lights, cameras=cameras, materials=materials,
        )
        N, H, W, K = fragments.pix_to_face.shape
        alpha = jnp.ones_like(colors[..., :1])
        colors_a = jnp.concatenate([colors[..., :3], alpha], axis=-1)
        pixel_coords = pixel_coords_screen_from_fragments(
            fragments, meshes, cameras, (H, W)
        )
        blender = SplatterBlender()
        return blender(colors_a, pixel_coords, fragments, blend_params)


class TexturedSoftPhongShader(SoftPhongShader):
    """DEPRECATED alias of SoftPhongShader (reference shader.py keeps it
    for backward compatibility)."""

    def __init__(self, *args, **kwargs):
        import warnings

        warnings.warn(
            "TexturedSoftPhongShader is deprecated; use SoftPhongShader",
            PendingDeprecationWarning,
            stacklevel=2,
        )
        super().__init__(*args, **kwargs)
