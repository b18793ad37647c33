"""Fit mesh geometry + vertex colors from posed images.

Mirrors the reference tutorial docs/tutorials/fit_textured_mesh.ipynb:
render a target scene from several viewpoints, then optimize an
ico-sphere's vertex offsets and vertex colors so its differentiable
renders match those images (soft silhouette-style blur rasterization for
useful gradients + RGB supervision).
"""

from _example_utils import image_grid, save_image

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch3d_tpu.loss import mesh_edge_loss, mesh_laplacian_smoothing
from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    HardPhongShader,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    SoftPhongShader,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex
from pytorch3d_tpu.utils import ico_sphere, torus

S = 96
N_VIEWS = 8


def make_renderer(cameras, soft: bool):
    lights = PointLights.create(location=[[0.0, 2.0, -3.0]])
    if soft:
        settings = RasterizationSettings(
            image_size=S,
            faces_per_pixel=16,
            blur_radius=float(np.log(1.0 / 1e-4 - 1.0) * 1e-4),
        )
        shader = SoftPhongShader(cameras=cameras, lights=lights)
    else:
        settings = RasterizationSettings(image_size=S, faces_per_pixel=1)
        shader = HardPhongShader(cameras=cameras, lights=lights)
    return MeshRenderer(MeshRasterizer(cameras, settings), shader)


def main() -> None:
    # target: a colored torus rendered from a ring of cameras
    target = torus(r=0.4, R=0.9, sides=24, rings=48)
    tv = target.verts_padded()
    colors = (tv - tv.min(axis=1)) / (tv.max(axis=1) - tv.min(axis=1))
    target = target.replace(textures=TexturesVertex.create(colors))

    azims = jnp.linspace(-180.0, 180.0, N_VIEWS, endpoint=False)
    R, T = look_at_view_transform(dist=2.8, elev=25.0, azim=azims)
    cameras = FoVPerspectiveCameras.create(R=R, T=T, fov=60.0)
    target_images = make_renderer(cameras, soft=False)(
        target.extend(N_VIEWS), cameras=cameras
    )[..., :3]

    src = ico_sphere(3)
    params = {
        "deform": jnp.zeros_like(src.verts_padded()),
        "colors": jnp.full(src.verts_padded().shape, 0.5),
    }
    opt = optax.adam(5e-3)
    state = opt.init(params)
    soft_renderer = make_renderer(cameras, soft=True)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            mesh = src.update_padded(src.verts_padded() + p["deform"])
            mesh = mesh.replace(
                textures=TexturesVertex.create(
                    jax.nn.sigmoid(4.0 * (p["colors"] - 0.5))
                )
            )
            preds = soft_renderer(mesh.extend(N_VIEWS), cameras=cameras)
            rgb = preds[..., :3]
            sil = preds[..., 3]
            tgt_sil = (target_images.sum(-1) < 2.95).astype(jnp.float32)
            loss_rgb = jnp.mean((rgb - target_images) ** 2)
            loss_sil = jnp.mean((sil - tgt_sil) ** 2)
            reg = 0.5 * mesh_edge_loss(mesh) + 0.05 * mesh_laplacian_smoothing(
                mesh
            )
            return loss_rgb + loss_sil + reg

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    for it in range(201):
        params, state, loss = step(params, state)
        if it % 50 == 0:
            print(f"iter {it:4d}  loss {float(loss):.4f}")

    fitted = src.update_padded(src.verts_padded() + params["deform"])
    fitted = fitted.replace(
        textures=TexturesVertex.create(
            jax.nn.sigmoid(4.0 * (params["colors"] - 0.5))
        )
    )
    preds = make_renderer(cameras, soft=False)(
        fitted.extend(N_VIEWS), cameras=cameras
    )
    tiles = [np.asarray(target_images[0]), np.asarray(preds[0, ..., :3]),
             np.asarray(target_images[3]), np.asarray(preds[3, ..., :3])]
    save_image("fit_textured_mesh.png", image_grid(tiles, cols=2))
    assert float(loss) < 0.08
    print("done")


if __name__ == "__main__":
    main()
