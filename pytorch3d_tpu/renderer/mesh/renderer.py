"""MeshRenderer = rasterizer ∘ shader (parity: reference renderer.py:32)."""

from __future__ import annotations

import jax.numpy as jnp


class MeshRenderer:
    """Compose a rasterizer and a shader into an image pipeline."""

    def __init__(self, rasterizer, shader):
        self.rasterizer = rasterizer
        self.shader = shader

    def __call__(self, meshes_world, **kwargs) -> jnp.ndarray:
        return self.forward(meshes_world, **kwargs)

    def forward(self, meshes_world, **kwargs) -> jnp.ndarray:
        fragments = self.rasterizer(meshes_world, **kwargs)
        images = self.shader(fragments, meshes_world, **kwargs)
        return images


class MeshRendererWithFragments(MeshRenderer):
    """Also return the Fragments (reference renderer.py:70)."""

    def forward(self, meshes_world, **kwargs):
        fragments = self.rasterizer(meshes_world, **kwargs)
        images = self.shader(fragments, meshes_world, **kwargs)
        return images, fragments
