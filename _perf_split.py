import time
import jax, jax.numpy as jnp
import numpy as np
from pytorch3d_tpu.utils import ico_sphere
from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras, look_at_view_transform, MeshRasterizer,
    RasterizationSettings,
)
from pytorch3d_tpu.renderer.mesh import rasterize_pallas as rp

mesh = ico_sphere(4)
R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=30.0)
cams = FoVPerspectiveCameras.create(R=R, T=T)
rast = MeshRasterizer(cams, RasterizationSettings(image_size=512, blur_radius=1e-4, faces_per_pixel=8))
tm = rast.transform(mesh)
fv = tm.verts_padded()[0][tm.faces_padded()[0]]
valid = tm.faces_padded()[0, :, 0] >= 0

coords, ids, counts = rp._bin_faces(fv, valid, (512, 512), 1e-4, (32, 128), 2048)[:3]
cc = np.asarray(counts); per_tile = cc.reshape(cc.shape[0], -1)[:, 0]
tot_cand = per_tile.sum() * 32 * 128
print(f"tiles={cc.shape[0]} mean={per_tile.mean():.1f} max={per_tile.max()} cand={tot_cand/1e9:.3f}G")

def bench_fn(fn, arg, n=30):
    o = jax.block_until_ready(fn(arg)); t0 = time.perf_counter()
    for _ in range(n): o = fn(arg)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n

jsel = jax.jit(lambda v: rp.rasterize_topk_pallas(v, valid, (512, 512), 1e-4, 8))
t_sel = bench_fn(jsel, fv)

def loss(v):
    out = rp.rasterize_fragments_pallas(v, valid, (512, 512), 1e-4, 8)
    return jnp.sum(jax.nn.sigmoid(-out[3]/1e-4))*1e-6 + jnp.sum(out[1])*1e-6
jfull = jax.jit(jax.grad(loss))
t_full = bench_fn(jfull, fv)
jf = jax.jit(loss)
t_fwd = bench_fn(jf, fv)
print(f"select-only {t_sel*1e3:.2f} ms | fwd(frags+loss) {t_fwd*1e3:.2f} ms | fwd+bwd {t_full*1e3:.2f} ms")
print(f"select rate {tot_cand/t_sel/1e9:.2f} G cand/s; ~40flops/cand -> {tot_cand*40/t_sel/1e12:.2f} TFLOP/s fp32-eq")
