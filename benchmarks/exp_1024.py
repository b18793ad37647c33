"""Phase decomposition of the 1024² rasterization cliff (VERDICT r2 weak #1).

At ico6/1024² the fine kernel's candidate count grows only 1.24x over
512² but wall time grows 3x.  Hypothesis: the grid is
(n_tiles, MFT/CHUNK) with the jit-path heuristic MFT = F//4 = 20480 (20
chunks), while the average tile holds only ~540 live faces — so ~95% of
grid steps are dead but still pay the SMEM block fetch + grid-step
overhead; and the XLA binning (top_k over (256, 81920) with k=20480 +
a 755 MB gather) is itself non-trivial.

Measures, on the live chip at ico6 1024² K8 blur=1e-5:
  - required_faces_per_tile (the true max),
  - _bin_faces alone at heuristic vs exact capacity,
  - the select/emit pallas_call alone (prebinned inputs) at both
    capacities,
  - end-to-end select at both capacities.

Writes EXP_1024.json.  Run: python -m benchmarks.exp_1024
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp


def main():
    from benchmarks.bm_rasterize_meshes import _setup
    from benchmarks.runner import time_fn
    from pytorch3d_tpu.renderer.mesh import rasterize_pallas as rp

    level, size, K, blur = 6, 1024, 8, 1e-5
    mesh_ndc = _setup(level, size, K, blur)
    fv = mesh_ndc.verts_padded()[0][mesh_ndc.faces_padded()[0]]
    valid = jnp.ones((fv.shape[0],), bool)
    F = fv.shape[0]
    tile = rp._tile_for_k(K)
    rows = []

    need = int(
        rp.required_faces_per_tile(fv, valid, (size, size), blur, tile)
    )
    mft_exact = rp._round_mft(1 << (need - 1).bit_length(), F)
    mft_heur = rp._heuristic_mft(F, (size, size), tile)
    rows.append(
        {
            "name": "capacity",
            "required": need,
            "mft_exact": mft_exact,
            "mft_heuristic": mft_heur,
        }
    )
    print(rows[-1], flush=True)

    ok = rp._face_ok(fv, valid, False)

    for tag, mft in (("heur", mft_heur), ("exact", mft_exact)):
        bin_fn = jax.jit(
            lambda v, _m=mft: rp._bin_faces(
                v, ok, (size, size), blur, tile, _m
            )[0]
        )
        rows.append(
            {"name": f"bin_faces_{tag}", "mft": mft,
             "ms": time_fn(lambda: bin_fn(fv)) * 1e3}
        )
        print(rows[-1], flush=True)

        sel = jax.jit(
            lambda v, _m=mft: rp.rasterize_topk_pallas(
                v, valid, (size, size), blur, K, max_faces_per_tile=_m
            )
        )
        rows.append(
            {"name": f"select_e2e_{tag}", "mft": mft,
             "ms": time_fn(lambda: sel(fv)) * 1e3}
        )
        print(rows[-1], flush=True)

        emit = jax.jit(
            lambda v, _m=mft: rp.rasterize_fragments_pallas(
                v, valid, (size, size), blur, K, False, False, False, _m
            )
        )
        rows.append(
            {"name": f"emit_e2e_{tag}", "mft": mft,
             "ms": time_fn(lambda: emit(fv)) * 1e3}
        )
        print(rows[-1], flush=True)

        def loss(v, _m=mft):
            out = rp.rasterize_fragments_pallas(
                v, valid, (size, size), blur, K, False, False, False, _m
            )
            return jnp.sum(out[3]) * 1e-6 + jnp.sum(out[1]) * 1e-6

        g = jax.jit(jax.grad(loss))
        rows.append(
            {"name": f"fwdbwd_e2e_{tag}", "mft": mft,
             "ms": time_fn(lambda: g(fv)) * 1e3}
        )
        print(rows[-1], flush=True)

    # pallas_call alone on prebinned inputs (exact capacity)
    fv9, ids, counts, n_ty, n_tx, _ = jax.jit(
        lambda v: rp._bin_faces(v, ok, (size, size), blur, tile, mft_exact)
    )(fv)
    total_live = int(jnp.sum(counts[:, 0, 0]))
    rows.append({"name": "total_face_tile_pairs", "value": total_live})
    print(rows[-1], flush=True)

    with open("EXP_1024.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote EXP_1024.json")


if __name__ == "__main__":
    main()
