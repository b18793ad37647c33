"""Reference-parity batch 4: _SymEig3x3, corresponding_cameras_alignment,
wmean, ndc_grid_sample / ndc_to_grid_sample_coords — the remaining
pure-torch reference utilities that previously had only self-tests."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
    )


class TestSymEig3x3Parity:
    def _mats(self, seed=0, n=32):
        rng = np.random.RandomState(seed)
        a = rng.randn(n, 3, 3).astype(np.float32)
        sym = (a + np.swapaxes(a, 1, 2)) / 2
        # include degenerate cases: repeated eigenvalues, diagonal, zero
        sym[0] = np.eye(3)
        sym[1] = np.diag([2.0, 2.0, 5.0])
        sym[2] = 0.0
        sym[3] = np.diag([3.0, 3.0, 3.0])
        return sym

    def test_eigenvalues_and_reconstruction(self):
        from pytorch3d.common.workaround import symeig3x3 as ref_symeig3x3

        from pytorch3d_tpu.common.symeig3x3 import symeig3x3

        mats = self._mats()
        vals_ref, vecs_ref = ref_symeig3x3(
            torch.from_numpy(mats), eigenvectors=True
        )
        vals, vecs = symeig3x3(jnp.asarray(mats), eigenvectors=True)
        close(vals, t2n(vals_ref), rtol=1e-3, atol=1e-4)
        # eigenvectors can flip sign / permute within degenerate spaces;
        # compare via reconstruction A = V diag(w) V^T
        recon = np.einsum(
            "nij,nj,nkj->nik",
            np.asarray(vecs),
            np.asarray(vals),
            np.asarray(vecs),
        )
        np.testing.assert_allclose(recon, mats, rtol=1e-3, atol=1e-3)

    def test_matches_numpy_eigh(self):
        from pytorch3d_tpu.common.symeig3x3 import symeig3x3

        mats = self._mats(7)
        vals, _ = symeig3x3(jnp.asarray(mats), eigenvectors=True)
        want = np.linalg.eigvalsh(mats)
        np.testing.assert_allclose(
            np.asarray(vals), want, rtol=1e-3, atol=1e-4
        )


class TestWmeanParity:
    @pytest.mark.parametrize("use_weight", [False, True])
    @pytest.mark.parametrize("axis", [-2, 1, (0, 1)])
    @pytest.mark.parametrize("keepdim", [True, False])
    def test_wmean(self, use_weight, axis, keepdim):
        from pytorch3d.ops.utils import wmean as ref_wmean

        from pytorch3d_tpu.ops import wmean

        rng = np.random.RandomState(3)
        x = rng.randn(4, 6, 3).astype(np.float32)
        w = rng.rand(4, 6).astype(np.float32) if use_weight else None
        ref = ref_wmean(
            torch.from_numpy(x),
            weight=torch.from_numpy(w) if w is not None else None,
            dim=axis,
            keepdim=keepdim,
        )
        ours = wmean(
            jnp.asarray(x),
            weight=jnp.asarray(w) if w is not None else None,
            axis=axis,
            keepdims=keepdim,
        )
        close(ours, t2n(ref), rtol=1e-5, atol=1e-6)


class TestCamerasAlignmentParity:
    @pytest.mark.parametrize("mode", ["centers", "extrinsics"])
    @pytest.mark.parametrize("estimate_scale", [True, False])
    def test_alignment(self, mode, estimate_scale):
        from pytorch3d.ops import (
            corresponding_cameras_alignment as ref_align,
        )
        from pytorch3d.renderer import PerspectiveCameras as RefCameras
        from pytorch3d.transforms import random_rotations

        from pytorch3d_tpu.ops import corresponding_cameras_alignment
        from pytorch3d_tpu.renderer import PerspectiveCameras

        torch.manual_seed(42)
        N = 6
        R_src = random_rotations(N)
        T_src = torch.randn(N, 3)
        # a known similarity applied to the sources
        R_align = random_rotations(1)[0]
        s_align = 1.3 if estimate_scale else 1.0
        # tgt cameras: rotate/translate/scale the src world
        R_tgt = torch.bmm(R_align[None].expand(N, 3, 3).transpose(1, 2), R_src)
        T_tgt = s_align * T_src + torch.randn(1, 3).expand(N, 3) * 0.1

        ref_src = RefCameras(R=R_src, T=T_src)
        ref_tgt = RefCameras(R=R_tgt, T=T_tgt)
        ref_out = ref_align(
            ref_src, ref_tgt, estimate_scale=estimate_scale, mode=mode
        )

        our_src = PerspectiveCameras.create(
            R=jnp.asarray(t2n(R_src)), T=jnp.asarray(t2n(T_src))
        )
        our_tgt = PerspectiveCameras.create(
            R=jnp.asarray(t2n(R_tgt)), T=jnp.asarray(t2n(T_tgt))
        )
        our_out = corresponding_cameras_alignment(
            our_src, our_tgt, estimate_scale=estimate_scale, mode=mode
        )
        close(our_out.R, t2n(ref_out.R), rtol=1e-3, atol=1e-4)
        close(our_out.T, t2n(ref_out.T), rtol=1e-3, atol=1e-3)


class TestNdcGridSampleParity:
    @pytest.mark.parametrize("align_corners", [False, True])
    @pytest.mark.parametrize("HW", [(8, 8), (6, 10)])
    def test_ndc_grid_sample(self, align_corners, HW):
        from pytorch3d.renderer.utils import (
            ndc_grid_sample as ref_ndc_grid_sample,
        )

        from pytorch3d_tpu.renderer import ndc_grid_sample

        H, W = HW
        rng = np.random.RandomState(11)
        img = rng.rand(2, 3, H, W).astype(np.float32)
        grid = rng.uniform(-1.1, 1.1, size=(2, 17, 2)).astype(np.float32)
        ref = ref_ndc_grid_sample(
            torch.from_numpy(img),
            torch.from_numpy(grid),
            align_corners=align_corners,
        )
        ours = ndc_grid_sample(
            jnp.asarray(img), jnp.asarray(grid), align_corners=align_corners
        )
        close(ours, t2n(ref), rtol=1e-4, atol=1e-5)

    def test_ndc_to_grid_sample_coords_nonsquare(self):
        from pytorch3d.renderer.utils import (
            ndc_to_grid_sample_coords as ref_fn,
        )

        from pytorch3d_tpu.renderer import ndc_to_grid_sample_coords

        rng = np.random.RandomState(13)
        xy = rng.uniform(-1.5, 1.5, size=(4, 9, 2)).astype(np.float32)
        for hw in [(6, 10), (10, 6), (8, 8)]:
            ref = ref_fn(torch.from_numpy(xy), hw)
            ours = ndc_to_grid_sample_coords(jnp.asarray(xy), hw)
            close(ours, t2n(ref), rtol=1e-5, atol=1e-6)
