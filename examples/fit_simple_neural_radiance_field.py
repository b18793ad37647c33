"""Fit a small NeRF to posed renders of a scene.

Mirrors the reference tutorial
docs/tutorials/fit_simple_neural_radiance_field.ipynb: render a colored
scene from a camera ring, then train our RadianceFieldRenderer (the
projects/nerf model family) on those views and re-render held-out poses.
Sized for CPU minutes: 48^2 images, 24 views, 96-wide MLP, 300 steps.
"""

from _example_utils import image_grid, save_image

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch3d_tpu.models import RadianceFieldRenderer
from pytorch3d_tpu.models.nerf.utils import calc_psnr
from pytorch3d_tpu.parallel import make_nerf_train_step
from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    HardPhongShader,
    MeshRasterizer,
    MeshRenderer,
    PointLights,
    RasterizationSettings,
    look_at_view_transform,
)
from pytorch3d_tpu.renderer.mesh.textures import TexturesVertex
from pytorch3d_tpu.structures import join_meshes_as_scene
from pytorch3d_tpu.utils import ico_sphere

S = 48
N_VIEWS = 24
STEPS = 300


def build_scene():
    parts = []
    for pos, color, rad in [
        ((-0.5, 0.0, 0.0), (0.9, 0.3, 0.2), 0.45),
        ((0.5, 0.0, 0.0), (0.2, 0.4, 0.9), 0.45),
    ]:
        s = ico_sphere(2)
        v = s.verts_padded() * rad + jnp.asarray(pos)
        s = s.update_padded(v)
        s = s.replace(
            textures=TexturesVertex.create(
                jnp.broadcast_to(jnp.asarray(color, jnp.float32), v.shape)
            )
        )
        parts.append(s)
    return join_meshes_as_scene(parts)


def main() -> None:
    azims = jnp.linspace(-180.0, 180.0, N_VIEWS, endpoint=False)
    R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=azims)
    cameras = FoVPerspectiveCameras.create(R=R, T=T, fov=60.0, znear=1.0, zfar=4.5)
    renderer = MeshRenderer(
        MeshRasterizer(
            cameras, RasterizationSettings(image_size=S, faces_per_pixel=1)
        ),
        HardPhongShader(
            cameras=cameras,
            lights=PointLights.create(location=[[0.0, 2.0, -3.0]]),
        ),
    )
    rgba = renderer(build_scene().extend(N_VIEWS), cameras=cameras)
    alpha = rgba[..., 3:4]
    images = rgba[..., :3] * alpha + (1.0 - alpha)  # white background

    model = RadianceFieldRenderer(
        image_width=S, image_height=S,
        n_pts_per_ray=24, n_pts_per_ray_fine=24, n_rays_per_image=512,
        min_depth=1.0, max_depth=4.5, stratified=True, stratified_test=False,
        n_harmonic_functions_xyz=6, n_harmonic_functions_dir=4,
        n_hidden_neurons_xyz=96, n_hidden_neurons_dir=48,
        n_layers_xyz=4, append_xyz=(2,), bg_color=(1.0, 1.0, 1.0),
    )

    def cam(i):
        return FoVPerspectiveCameras.create(
            R=R[i : i + 1], T=T[i : i + 1], fov=60.0, znear=1.0, zfar=4.5
        )

    key = jax.random.PRNGKey(0)
    params = model.init(
        jax.random.PRNGKey(1), cam(0), image=images[0:1], key=key
    )
    opt = optax.adam(5e-4)
    state = opt.init(params)
    step_fn = make_nerf_train_step(model, opt)

    test_idx = [0, N_VIEWS // 3]
    train_idx = [i for i in range(N_VIEWS) if i not in test_idx]
    rng = np.random.RandomState(0)
    for it in range(1, STEPS + 1):
        i = train_idx[rng.randint(len(train_idx))]
        key, sub = jax.random.split(key)
        params, state, metrics = step_fn(
            params, state, cam(i), images[i : i + 1], sub
        )
        if it % 100 == 0:
            print(f"step {it:4d}  loss {float(metrics['loss']):.4f}")

    @jax.jit
    def eval_full(params, cameras):
        out, _ = model.apply(
            params, cameras, image=None, training=False,
            key=jax.random.PRNGKey(0), chunksize=S * S, chunk_idx=0,
        )
        return out["rgb_fine"].reshape(S, S, 3)

    tiles, psnrs = [], []
    for j in test_idx:
        pred = eval_full(params, cam(j))
        psnrs.append(float(calc_psnr(pred[None], images[j : j + 1])))
        tiles += [np.asarray(images[j]), np.asarray(pred)]
    save_image("nerf_heldout.png", image_grid(tiles, cols=2))
    print(f"held-out PSNR: {np.mean(psnrs):.2f} dB")
    assert np.mean(psnrs) > 15.0
    print("done")


if __name__ == "__main__":
    main()
