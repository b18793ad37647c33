"""Golden-image regression tests (reference strategy: committed PNGs in
tests/data compared with assertClose, common_testing.py:62)."""

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    HardGouraudShader,
    HardPhongShader,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    SoftPhongShader,
    SoftSilhouetteShader,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex
from pytorch3d_tpu.utils import ico_sphere, torus

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def load_rgb_image(name):
    return (
        np.asarray(Image.open(os.path.join(DATA_DIR, name)), np.float32) / 255.0
    )


def assert_image_close(img, name, atol=0.02, max_frac_bad=0.005):
    golden = load_rgb_image(name)
    got = np.asarray(img[0])
    assert got.shape == golden.shape, (got.shape, golden.shape)
    # allow a small fraction of pixels to deviate (edge antialiasing noise)
    bad = (np.abs(got - golden) > atol).mean()
    assert bad <= max_frac_bad, f"{name}: {bad:.4f} of pixels differ"


def _scene():
    R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=30.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    mesh = ico_sphere(3)
    mesh = mesh.replace(
        textures=TexturesVertex.create(mesh.verts_padded() * 0.5 + 0.5)
    )
    lights = PointLights.create(location=[[0, 0, -3]])
    return cams, mesh, lights


class TestGoldenImages:
    def test_hard_phong(self):
        cams, mesh, lights = _scene()
        renderer = MeshRenderer(
            MeshRasterizer(cams, RasterizationSettings(image_size=128)),
            HardPhongShader(cameras=cams, lights=lights),
        )
        assert_image_close(
            renderer(mesh)[..., :3], "golden_sphere_hard_phong.png"
        )

    def test_soft_phong(self):
        cams, mesh, lights = _scene()
        renderer = MeshRenderer(
            MeshRasterizer(
                cams,
                RasterizationSettings(
                    image_size=128, blur_radius=1e-4, faces_per_pixel=4
                ),
            ),
            SoftPhongShader(cameras=cams, lights=lights),
        )
        assert_image_close(
            renderer(mesh)[..., :3], "golden_sphere_soft_phong.png"
        )

    def test_silhouette(self):
        cams, mesh, _ = _scene()
        renderer = MeshRenderer(
            MeshRasterizer(
                cams,
                RasterizationSettings(
                    image_size=128, blur_radius=2e-4, faces_per_pixel=8
                ),
            ),
            SoftSilhouetteShader(),
        )
        img = renderer(mesh)[..., 3:4]
        assert_image_close(
            jnp.repeat(img, 3, axis=-1), "golden_sphere_silhouette.png"
        )

    def test_torus_gouraud(self):
        cams, _, lights = _scene()
        tor = torus(0.4, 1.2, 12, 24)
        tor = tor.replace(
            textures=TexturesVertex.create(
                jnp.ones_like(tor.verts_padded()) * jnp.asarray([0.8, 0.6, 0.3])
            )
        )
        renderer = MeshRenderer(
            MeshRasterizer(cams, RasterizationSettings(image_size=128)),
            HardGouraudShader(cameras=cams, lights=lights),
        )
        assert_image_close(renderer(tor)[..., :3], "golden_torus_gouraud.png")


class TestJoinSceneTextures:
    """Joined-scene per-face texture alignment with heterogeneous face
    counts (the compaction permutation must be applied to texture rows)."""

    def _scene(self, textures):
        # mesh A: one triangle on the left; mesh B: two triangles (quad) right
        va = jnp.asarray([[-0.9, -0.4, 1.0], [-0.1, -0.4, 1.0], [-0.5, 0.4, 1.0]])
        fa = jnp.asarray([[0, 1, 2]], jnp.int32)
        vb = jnp.asarray(
            [[0.1, -0.4, 1.0], [0.9, -0.4, 1.0], [0.9, 0.4, 1.0], [0.1, 0.4, 1.0]]
        )
        fb = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        from pytorch3d_tpu.structures import Meshes

        return Meshes.create([va, vb], [fa, fb], textures=textures)

    def _render(self, scene):
        from pytorch3d_tpu.renderer import (
            FoVOrthographicCameras,
            MeshRasterizer,
            MeshRenderer,
            RasterizationSettings,
            SoftSilhouetteShader,
        )
        from pytorch3d_tpu.renderer.mesh.shader import HardFlatShader
        from pytorch3d_tpu.renderer.lighting import AmbientLights

        cams = FoVOrthographicCameras.create(
            R=jnp.eye(3)[None], T=jnp.zeros((1, 3))
        )
        renderer = MeshRenderer(
            MeshRasterizer(
                cams, RasterizationSettings(image_size=64, bin_size=0)
            ),
            HardFlatShader(
                cameras=cams, lights=AmbientLights.create(ambient_color=((1.0, 1.0, 1.0),))
            ),
        )
        return np.asarray(renderer(scene))[0]

    def test_atlas_alignment(self):
        from pytorch3d_tpu.renderer.mesh.textures import TexturesAtlas
        from pytorch3d_tpu.structures import join_meshes_as_scene

        red = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (1, 1, 1, 3))
        green = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (2, 1, 1, 3))
        tex = TexturesAtlas.create([red, green])
        scene = join_meshes_as_scene(self._scene(tex))
        img = self._render(scene)
        # left half red, right half green (NDC +X left => mesh A is right in px)
        left = img[:, :28]
        right = img[:, 36:]
        lr = (left[..., 0] > 0.5) & (left[..., 1] < 0.3)
        lg = (left[..., 1] > 0.5) & (left[..., 0] < 0.3)
        rr = (right[..., 0] > 0.5) & (right[..., 1] < 0.3)
        rg = (right[..., 1] > 0.5) & (right[..., 0] < 0.3)
        # one side purely red, the other purely green
        assert (lr.sum() > 50 and rg.sum() > 50 and lg.sum() == 0 and rr.sum() == 0) or (
            lg.sum() > 50 and rr.sum() > 50 and lr.sum() == 0 and rg.sum() == 0
        )

    def test_uv_alignment(self):
        from pytorch3d_tpu.renderer.mesh.textures import TexturesUV
        from pytorch3d_tpu.structures import join_meshes_as_scene

        red_map = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (4, 4, 3))
        green_map = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (4, 4, 3))
        tex = TexturesUV.create(
            maps=[red_map, green_map],
            faces_uvs=[
                jnp.asarray([[0, 1, 2]], jnp.int32),
                jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32),
            ],
            verts_uvs=[
                jnp.asarray([[0.2, 0.2], [0.8, 0.2], [0.5, 0.8]]),
                jnp.asarray([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8]]),
            ],
        )
        scene = join_meshes_as_scene(self._scene(tex))
        img = self._render(scene)
        left = img[:, :28]
        right = img[:, 36:]
        lr = (left[..., 0] > 0.5) & (left[..., 1] < 0.3)
        rg = (right[..., 1] > 0.5) & (right[..., 0] < 0.3)
        lg = (left[..., 1] > 0.5) & (left[..., 0] < 0.3)
        rr = (right[..., 0] > 0.5) & (right[..., 1] < 0.3)
        assert (lr.sum() > 50 and rg.sum() > 50 and lg.sum() == 0 and rr.sum() == 0) or (
            lg.sum() > 50 and rr.sum() > 50 and lr.sum() == 0 and rg.sum() == 0
        )

    def test_uv_no_bleed_at_map_edges(self):
        """UVs at the extreme 0/1 u-range must sample pure submap colors:
        packed maps get a half-texel clamp so bilinear support never
        straddles the adjacent mesh's map (ADVICE round 1)."""
        from pytorch3d_tpu.renderer.mesh.textures import TexturesUV
        from pytorch3d_tpu.structures import join_meshes_as_scene

        red_map = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (4, 4, 3))
        green_map = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (4, 4, 3))
        tex = TexturesUV.create(
            maps=[red_map, green_map],
            faces_uvs=[
                jnp.asarray([[0, 1, 2]], jnp.int32),
                jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32),
            ],
            verts_uvs=[
                # full [0, 1] u-range: would bleed across the seam unclamped
                jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]]),
                jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]),
            ],
        )
        scene = join_meshes_as_scene(self._scene(tex))
        img = self._render(scene)
        fg = img[..., 3] > 0.5
        red = (img[..., 0] > 0.9) & (img[..., 1] < 0.1)
        green = (img[..., 1] > 0.9) & (img[..., 0] < 0.1)
        # every covered pixel is a pure submap color, never a blend
        assert (fg == (red | green)).all()
        assert red.sum() > 50 and green.sum() > 50


class TestCameraPoseOptimization:
    """The classic pytorch3d tutorial workflow: recover a camera pose by
    differentiating a soft silhouette through the rasterizer
    (reference docs/tutorials/camera_position_optimization...)."""

    def test_recover_azimuth(self):
        import jax
        import optax

        from pytorch3d_tpu.renderer import (
            BlendParams,
            MeshRasterizer,
            MeshRenderer,
            RasterizationSettings,
            SoftSilhouetteShader,
            look_at_view_transform,
        )
        from pytorch3d_tpu.utils import ico_sphere

        mesh = ico_sphere(2)
        # squash the sphere so azimuth is observable in the silhouette
        mesh = mesh.update_padded(
            mesh.verts_padded() * jnp.asarray([1.0, 0.35, 0.7])
        )

        def render_at(azim_deg):
            R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=azim_deg)
            cams = FoVPerspectiveCameras.create(R=R, T=T)
            renderer = MeshRenderer(
                MeshRasterizer(
                    cams,
                    RasterizationSettings(
                        image_size=48,
                        bin_size=0,
                        blur_radius=2e-3,
                        faces_per_pixel=16,
                    ),
                ),
                SoftSilhouetteShader(
                    blend_params=BlendParams(sigma=1e-3, gamma=1e-3)
                ),
            )
            return renderer(mesh)[..., 3]

        target = render_at(10.0)

        def loss_fn(azim):
            d = render_at(azim) - target
            return jnp.mean(d * d)

        loss_and_grad = jax.jit(jax.value_and_grad(loss_fn))
        azim = jnp.asarray(45.0)
        opt = optax.adam(2.0)
        state = opt.init(azim)
        l0 = None
        for _ in range(40):
            l, g = loss_and_grad(azim)
            if l0 is None:
                l0 = float(l)
            upd, state = opt.update(g, state)
            azim = optax.apply_updates(azim, upd)
        assert np.isfinite(float(l))
        assert float(l) < 0.25 * l0, (l0, float(l))
        assert abs(float(azim) - 10.0) < 8.0, float(azim)
