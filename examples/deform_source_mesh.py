"""Deform a sphere into a target shape with mesh losses.

Mirrors the reference tutorial
docs/tutorials/deform_source_mesh_to_target_mesh.ipynb: optimize per-vertex
offsets of an ico-sphere toward points sampled from a target mesh using
chamfer distance + edge + laplacian + normal-consistency regularizers,
all inside one `jax.jit`-compiled Adam step.
"""

from _example_utils import save_image

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch3d_tpu.loss import (
    chamfer_distance,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
)
from pytorch3d_tpu.ops import sample_points_from_meshes
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
from pytorch3d_tpu.utils import ico_sphere, torus


def render_turntable(mesh, name):
    R, T = look_at_view_transform(
        dist=3.0, elev=20.0, azim=jnp.asarray([0.0, 120.0])
    )
    cameras = FoVPerspectiveCameras.create(R=R, T=T, fov=60.0)
    renderer = MeshRenderer(
        MeshRasterizer(
            cameras, RasterizationSettings(image_size=196, faces_per_pixel=1)
        ),
        HardPhongShader(
            cameras=cameras,
            lights=PointLights.create(location=[[0.0, 2.0, -3.0]]),
        ),
    )
    colors = jnp.broadcast_to(
        jnp.asarray([0.7, 0.7, 1.0]), mesh.verts_padded().shape
    )
    mesh = mesh.replace(textures=TexturesVertex.create(colors))
    imgs = renderer(mesh.extend(2), cameras=cameras)
    grid = np.concatenate([np.asarray(imgs[0]), np.asarray(imgs[1])], axis=1)
    save_image(name, grid)


def main() -> None:
    src = ico_sphere(4)
    tgt = torus(r=0.4, R=0.9, sides=32, rings=64)
    tgt_pts = sample_points_from_meshes(
        tgt, num_samples=5000, key=jax.random.PRNGKey(0)
    )

    deform = jnp.zeros_like(src.verts_padded())
    opt = optax.adam(1e-2)
    state = opt.init(deform)

    @jax.jit
    def step(deform, state, key):
        def loss_fn(dv):
            mesh = src.update_padded(src.verts_padded() + dv)
            pts = sample_points_from_meshes(mesh, num_samples=5000, key=key)
            cd, _ = chamfer_distance(pts, tgt_pts)
            return (
                cd
                + 1.0 * mesh_edge_loss(mesh)
                + 0.1 * mesh_laplacian_smoothing(mesh, method="uniform")
                + 0.01 * mesh_normal_consistency(mesh)
            )

        loss, g = jax.value_and_grad(loss_fn)(deform)
        updates, state = opt.update(g, state)
        return optax.apply_updates(deform, updates), state, loss

    key = jax.random.PRNGKey(7)
    for it in range(301):
        key, sub = jax.random.split(key)
        deform, state, loss = step(deform, state, sub)
        if it % 100 == 0:
            print(f"iter {it:4d}  loss {float(loss):.4f}")

    final = src.update_padded(src.verts_padded() + deform)
    render_turntable(src, "deform_before.png")
    render_turntable(final, "deform_after.png")
    assert float(loss) < 0.15
    print("done")


if __name__ == "__main__":
    main()
