import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import (
    BlendParams,
    FoVPerspectiveCameras,
    HardFlatShader,
    HardGouraudShader,
    HardPhongShader,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    SoftPhongShader,
    SoftSilhouetteShader,
    TexturesVertex,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
    interpolate_fragments,
    rasterize_topk_xla,
)
from pytorch3d_tpu.structures import Meshes
from pytorch3d_tpu.utils import ico_sphere


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def make_sphere_mesh(level=2, color=(0.2, 0.5, 0.8)):
    m = ico_sphere(level)
    V = m.max_verts
    tex = TexturesVertex.create(jnp.broadcast_to(jnp.asarray(color), (1, V, 3)))
    return m.replace(textures=tex)


def sphere_camera(dist=2.7, elev=0.0, azim=0.0):
    R, T = look_at_view_transform(dist, elev, azim)
    return FoVPerspectiveCameras.create(R=R, T=T)


class TestRasterizeTopK:
    """Direct checks of the selection + recompute passes on one triangle."""

    def triangle(self):
        # large triangle covering the image center, z = 5 plane
        fv = jnp.array(
            [[[-0.9, -0.9, 5.0], [0.9, -0.9, 5.0], [0.0, 0.9, 5.0]]]
        )  # (1, 3, 3) CCW in pytorch3d NDC
        return fv

    def test_center_covered(self):
        fv = self.triangle()
        idx = rasterize_topk_xla(
            fv, jnp.ones((1,), bool), image_size=(16, 16), faces_per_pixel=1
        )
        assert int(idx[8, 8, 0]) == 0  # center pixel hit
        assert int(idx[0, 0, 0]) == -1  # corner empty
        # roughly half the pixels covered
        frac = float(jnp.mean(idx[..., 0] >= 0))
        assert 0.2 < frac < 0.7

    def test_zbuf_and_bary(self):
        fv = self.triangle()
        idx = rasterize_topk_xla(
            fv, jnp.ones((1,), bool), image_size=(16, 16), faces_per_pixel=1
        )
        zbuf, bary, dists = interpolate_fragments(fv, idx, (16, 16))
        center = idx[8, 8, 0]
        assert int(center) == 0
        assert_close(zbuf[8, 8, 0], 5.0, atol=1e-5)
        b = bary[8, 8, 0]
        assert_close(jnp.sum(b), 1.0, atol=1e-5)
        assert (np.asarray(b) > 0).all()
        assert float(dists[8, 8, 0]) < 0  # inside => negative

    def test_z_ordering_two_faces(self):
        # two stacked triangles; nearer one must come first
        fv = jnp.concatenate([self.triangle(), self.triangle() * jnp.array([1, 1, 0.5])])
        idx = rasterize_topk_xla(
            fv, jnp.ones((2,), bool), image_size=(8, 8), faces_per_pixel=2
        )
        assert int(idx[4, 4, 0]) == 1  # z=2.5 face first
        assert int(idx[4, 4, 1]) == 0

    def test_backface_cull(self):
        # In pytorch3d's convention (+X left) the standard-orientation CCW
        # triangle from self.triangle() is a *backface*; its reverse is front.
        fv_back = self.triangle()
        fv_front = fv_back[:, ::-1]
        idx_back = rasterize_topk_xla(
            fv_back, jnp.ones((1,), bool), image_size=(8, 8), faces_per_pixel=1,
            cull_backfaces=True,
        )
        idx_front = rasterize_topk_xla(
            fv_front, jnp.ones((1,), bool), image_size=(8, 8), faces_per_pixel=1,
            cull_backfaces=True,
        )
        assert int(jnp.max(idx_back)) == -1
        assert int(jnp.max(idx_front)) == 0

    def test_blur_radius_expands_coverage(self):
        fv = self.triangle()
        idx0 = rasterize_topk_xla(
            fv, jnp.ones((1,), bool), image_size=(32, 32), faces_per_pixel=1
        )
        idx1 = rasterize_topk_xla(
            fv, jnp.ones((1,), bool), image_size=(32, 32), faces_per_pixel=1,
            blur_radius=0.05,
        )
        assert int(jnp.sum(idx1 >= 0)) > int(jnp.sum(idx0 >= 0))


class TestMeshRenderer:
    def test_hard_phong_sphere(self):
        meshes = make_sphere_mesh()
        cameras = sphere_camera()
        raster_settings = RasterizationSettings(image_size=64, faces_per_pixel=1)
        lights = PointLights.create(location=((0.0, 0.0, -3.0),))
        renderer = MeshRenderer(
            rasterizer=MeshRasterizer(cameras=cameras, raster_settings=raster_settings),
            shader=HardPhongShader(cameras=cameras, lights=lights),
        )
        images = renderer(meshes)
        assert images.shape == (1, 64, 64, 4)
        img = np.asarray(images[0])
        # center: lit sphere, alpha 1; corner: white background, alpha 0
        assert img[32, 32, 3] == 1.0
        assert img[0, 0, 3] == 0.0
        assert_close(img[0, 0, :3], np.ones(3))
        # sphere color should be bluish (matches the texture)
        assert img[32, 32, 2] > img[32, 32, 0]

    def test_silhouette_and_grads(self):
        meshes = make_sphere_mesh()
        cameras = sphere_camera()
        sigma = 1e-4
        raster_settings = RasterizationSettings(
            image_size=64,
            blur_radius=float(np.log(1.0 / 1e-4 - 1.0) * sigma),
            faces_per_pixel=10,
        )
        rasterizer = MeshRasterizer(cameras=cameras, raster_settings=raster_settings)
        shader = SoftSilhouetteShader(BlendParams(sigma=sigma))

        def render_alpha(verts_padded):
            m = meshes.update_padded(verts_padded)
            frags = rasterizer(m)
            return shader(frags, m)[..., 3]

        alpha = render_alpha(meshes.verts_padded())
        assert float(alpha[0, 32, 32]) > 0.9
        assert float(alpha[0, 0, 0]) < 0.1

        target = jnp.zeros_like(alpha)

        def loss(verts):
            return jnp.mean((render_alpha(verts) - target) ** 2)

        g = jax.grad(loss)(meshes.verts_padded())
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0

    def test_soft_phong(self):
        meshes = make_sphere_mesh()
        cameras = sphere_camera()
        raster_settings = RasterizationSettings(
            image_size=32, blur_radius=1e-4, faces_per_pixel=4
        )
        renderer = MeshRenderer(
            rasterizer=MeshRasterizer(cameras=cameras, raster_settings=raster_settings),
            shader=SoftPhongShader(cameras=cameras),
        )
        images = renderer(meshes)
        assert images.shape == (1, 32, 32, 4)
        assert np.isfinite(np.asarray(images)).all()
        assert float(images[0, 16, 16, 3]) > 0.5

    def test_gouraud_and_flat(self):
        meshes = make_sphere_mesh()
        cameras = sphere_camera()
        raster_settings = RasterizationSettings(image_size=32, faces_per_pixel=1)
        rasterizer = MeshRasterizer(cameras=cameras, raster_settings=raster_settings)
        for shader_cls in (HardGouraudShader, HardFlatShader):
            renderer = MeshRenderer(
                rasterizer=rasterizer, shader=shader_cls(cameras=cameras)
            )
            images = renderer(meshes)
            assert np.isfinite(np.asarray(images)).all()
            assert float(images[0, 16, 16, 3]) == 1.0

    def test_batched_render(self):
        m = make_sphere_mesh()
        meshes = m.extend(2)
        R, T = look_at_view_transform(
            dist=jnp.array([2.7, 2.7]), elev=jnp.array([0.0, 90.0]), azim=0.0
        )
        cameras = FoVPerspectiveCameras.create(R=R, T=T)
        raster_settings = RasterizationSettings(image_size=32, faces_per_pixel=1)
        renderer = MeshRenderer(
            rasterizer=MeshRasterizer(cameras=cameras, raster_settings=raster_settings),
            shader=HardPhongShader(cameras=cameras),
        )
        images = renderer(meshes)
        assert images.shape == (2, 32, 32, 4)
        assert float(images[0, 16, 16, 3]) == 1.0
        assert float(images[1, 16, 16, 3]) == 1.0

    def test_heterogeneous_batch(self):
        # sphere + single triangle in one batch; padding must not leak
        sphere = ico_sphere(1)
        tri_verts = jnp.array([[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]])
        tri_faces = jnp.array([[[0, 1, 2]]])
        meshes = Meshes.create(
            verts=[sphere.verts_padded()[0], tri_verts[0]],
            faces=[sphere.faces_padded()[0], tri_faces[0]],
        )
        V = meshes.max_verts
        tex = TexturesVertex.create(jnp.ones((2, V, 3)))
        meshes = meshes.replace(textures=tex)
        cameras = sphere_camera()
        raster_settings = RasterizationSettings(image_size=32, faces_per_pixel=1)
        renderer = MeshRenderer(
            rasterizer=MeshRasterizer(cameras=cameras, raster_settings=raster_settings),
            shader=HardPhongShader(cameras=cameras),
        )
        images = renderer(meshes)
        assert images.shape == (2, 32, 32, 4)
        assert np.isfinite(np.asarray(images)).all()
