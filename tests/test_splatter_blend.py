"""Splatter blending: occlusion layers, border behavior, gradients.

Mirrors reference tests/test_splatter_blend.py (occlusion-layer unit
examples :199-246, compositing) plus a border no-wrap regression and the
forward-pass pixel-center property that pins the NDC->screen map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.renderer.splatter_blend import (
    _OFFSETS,
    SplatterBlender,
    _compute_occlusion_layers,
    pixel_coords_screen_from_fragments,
)
from pytorch3d_tpu.renderer import (
    BlendParams,
    FoVPerspectiveCameras,
    MeshRasterizer,
    MeshRenderer,
    RasterizationSettings,
    SplatterPhongShader,
    look_at_view_transform,
    PointLights,
)
from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex
from pytorch3d_tpu.utils import ico_sphere


class TestOcclusionLayers:
    def test_single_layer(self):
        # one rasterization layer -> every splat is co-surface (ref :199)
        q = jnp.asarray(np.random.RandomState(0).rand(2, 3, 4, 1), jnp.float32)
        occ = _compute_occlusion_layers(q)
        assert occ.shape == (2, 3, 4, 9)
        np.testing.assert_array_equal(np.asarray(occ), 0)

    def test_all_equal(self):
        q = jnp.full((2, 3, 4, 5), 0.1234)
        occ = _compute_occlusion_layers(q)
        np.testing.assert_array_equal(np.asarray(occ), 0)

    def test_mid_to_top_level_splatting(self):
        # reference :213: p's mid layer is co-surface with q's top layer
        for direction, (dy, dx) in enumerate(_OFFSETS):
            if direction == 4:
                continue
            depths = np.zeros((1, 3, 3, 3), np.float32)
            depths[0, 1, 1] = [0.71, 0.8, 1.0]  # q at center
            depths[0, dy + 1, dx + 1] = [0.5, 0.7, 0.9]  # p
            occ = np.asarray(
                _compute_occlusion_layers(jnp.asarray(depths))
            )
            assert occ[0, 1, 1, direction] == 1
            # swapped roles: top-level splats onto mid-level -> -1
            assert occ[0, dy + 1, dx + 1, 8 - direction] == -1


def _render_setup(image_size=64, level=1):
    mesh = ico_sphere(level)
    verts = mesh.verts_padded()
    cols = jnp.broadcast_to(
        jnp.asarray([0.8, 0.3, 0.2]), verts.shape
    )
    mesh = mesh.replace(textures=TexturesVertex.create(cols))
    R, T = look_at_view_transform(dist=2.7, elev=10.0, azim=30.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    lights = PointLights.create(location=jnp.asarray([[0.0, 2.0, -2.0]]))
    rast = MeshRasterizer(
        cams,
        RasterizationSettings(image_size=image_size, faces_per_pixel=4),
    )
    shader = SplatterPhongShader(
        cameras=cams,
        lights=lights,
        blend_params=BlendParams(sigma=0.5, background_color=(0.0, 0.0, 0.0)),
    )
    return mesh, rast, shader


class TestPixelCoords:
    def test_forward_pass_is_pixel_centers(self):
        # the interpolated screen position of the covering fragment must be
        # exactly the pixel center in the reference's with_xyflip=False
        # convention: x = -(col + .5), y = -(row + .5) (the perspective-
        # correct barycentrics put the world point on the pixel-center ray)
        mesh, rast, _ = _render_setup(image_size=48)
        frags = rast(mesh)
        H = W = 48
        xy = pixel_coords_screen_from_fragments(
            frags, mesh, rast.cameras, (H, W)
        )
        covered = np.asarray(frags.pix_to_face[0, ..., 0] >= 0)
        x = np.asarray(xy[0, ..., 0, 0])
        y = np.asarray(xy[0, ..., 0, 1])
        cols = -(np.arange(W)[None, :] + 0.5)
        rows = -(np.arange(H)[:, None] + 0.5)
        np.testing.assert_allclose(
            x[covered], np.broadcast_to(cols, (H, W))[covered], atol=2e-3
        )
        np.testing.assert_allclose(
            y[covered], np.broadcast_to(rows, (H, W))[covered], atol=2e-3
        )


class TestSplatterBlendRender:
    def test_no_border_wraparound(self):
        """A mesh covering only the left edge must leave the right edge at
        exactly the background color (round-1 jnp.roll wrapped splats)."""

        from pytorch3d_tpu.renderer.mesh.rasterizer import Fragments

        N, H, W, K = 1, 8, 8, 1
        colors = jnp.zeros((N, H, W, K, 4))
        # fragment in the leftmost column, bright red, alpha 1
        colors = colors.at[0, :, 0, 0].set(jnp.asarray([1.0, 0.0, 0.0, 1.0]))
        pix = jnp.full((N, H, W, K), -1, jnp.int32)
        pix = pix.at[0, :, 0, 0].set(5)
        zbuf = jnp.where(pix >= 0, 0.5, 1.0)
        # splat centers at pixel centers
        cols_c = jnp.arange(W)[None, None, :, None] + 0.5
        rows_c = jnp.arange(H)[None, :, None, None] + 0.5
        coords = jnp.stack(
            [jnp.broadcast_to(cols_c, (N, H, W, K)),
             jnp.broadcast_to(rows_c, (N, H, W, K))], axis=-1
        )
        frags = Fragments(
            pix_to_face=pix, zbuf=zbuf,
            bary_coords=jnp.zeros((N, H, W, K, 3)),
            dists=jnp.zeros((N, H, W, K)),
        )
        out = SplatterBlender()(
            colors, coords, frags,
            BlendParams(background_color=(0.0, 0.25, 0.0)),
        )
        out = np.asarray(out)
        # right edge: pure background, zero red, zero alpha
        np.testing.assert_allclose(out[0, :, -1, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[0, :, -1, 3], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[0, :, -1, 1], 0.25, atol=1e-6)
        # left edge: red splatted
        assert out[0, 4, 0, 0] > 0.5

    def test_render_and_gradients(self):
        mesh, rast, shader = _render_setup()
        renderer = MeshRenderer(rasterizer=rast, shader=shader)
        img = renderer(mesh)
        arr = np.asarray(img)
        assert np.isfinite(arr).all()
        cov = (arr[0, ..., 3] > 0.5).mean()
        assert 0.1 < cov < 0.9

        verts = mesh.verts_padded()

        def loss(v):
            m = mesh.update_padded(v)
            im = renderer(m)
            return jnp.sum(im[..., 3])  # silhouette area: boundary-driven

        g = jax.grad(loss)(verts)
        gn = np.asarray(g)
        assert np.isfinite(gn).all()
        # splatting exists to produce nonzero boundary gradients even with
        # a non-differentiable rasterization step
        assert np.abs(gn).max() > 1e-4
        # growing the sphere must grow the silhouette: gradient of area
        # w.r.t. radial scale is positive (checks the splat gradient SIGN)
        radial = float(jnp.sum(g * verts))
        assert radial > 0.0
