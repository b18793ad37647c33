"""Transform3d composition-semantics sweep vs the reference
(reference tests/test_transforms.py scenario breadth: chained
translate/rotate/scale, compose, inverse(invert_composed), stack,
transform_points/normals, eps clamping, axis-angle rotations).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()
import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pytorch3d.transforms import (  # noqa: E402
    Rotate as RefRotate,
    RotateAxisAngle as RefRotateAxisAngle,
    Scale as RefScale,
    Transform3d as RefTransform3d,
    Translate as RefTranslate,
    random_rotations as ref_random_rotations,
)

from pytorch3d_tpu.transforms import (  # noqa: E402
    Rotate,
    RotateAxisAngle,
    Scale,
    Transform3d,
    Translate,
)


def t2n(x):
    return x.detach().cpu().numpy()


RNG = np.random.RandomState(5)
PTS = RNG.randn(2, 11, 3).astype(np.float32)
NRM = RNG.randn(2, 11, 3).astype(np.float32)
ROT = t2n(ref_random_rotations(2, dtype=torch.float32))


def _assert_tfms_match(ours, ref, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours.get_matrix()), t2n(ref.get_matrix()), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(ours.transform_points(jnp.asarray(PTS))),
        t2n(ref.transform_points(torch.from_numpy(PTS))),
        atol=atol,
    )
    np.testing.assert_allclose(
        np.asarray(ours.transform_normals(jnp.asarray(NRM))),
        t2n(ref.transform_normals(torch.from_numpy(NRM))),
        atol=10 * atol,
    )


class TestTransform3dParity:
    def test_chained_methods(self):
        ours = (
            Transform3d()
            .translate(1.0, -2.0, 0.5)
            .rotate(jnp.asarray(ROT[0]))
            .scale(2.0)
            .translate(jnp.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]))
        )
        ref = (
            RefTransform3d()
            .translate(1.0, -2.0, 0.5)
            .rotate(torch.from_numpy(ROT[0]))
            .scale(2.0)
            .translate(torch.tensor([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]))
        )
        _assert_tfms_match(ours, ref)

    def test_compose_and_inverse(self):
        a = Translate(jnp.asarray([[1.0, 2.0, 3.0]]))
        b = Rotate(jnp.asarray(ROT))
        c = Scale(jnp.asarray([[0.5, 2.0, 1.5]]))
        ra = RefTranslate(torch.tensor([[1.0, 2.0, 3.0]]))
        rb = RefRotate(torch.from_numpy(ROT))
        rc = RefScale(torch.tensor([[0.5, 2.0, 1.5]]))
        comp, rcomp = a.compose(b, c), ra.compose(rb, rc)
        _assert_tfms_match(comp, rcomp)
        for flag in (False, True):
            _assert_tfms_match(
                comp.inverse(invert_composed=flag),
                rcomp.inverse(invert_composed=flag),
                atol=1e-4,
            )

    def test_stack(self):
        a = Translate(jnp.asarray([[1.0, 0.0, 0.0]]))
        b = Scale(3.0)
        ra = RefTranslate(torch.tensor([[1.0, 0.0, 0.0]]))
        rb = RefScale(3.0)
        np.testing.assert_allclose(
            np.asarray(a.stack(b).get_matrix()),
            t2n(ra.stack(rb).get_matrix()),
            atol=1e-6,
        )

    @pytest.mark.parametrize("axis", ["X", "Y", "Z"])
    @pytest.mark.parametrize("degrees", [True, False])
    def test_rotate_axis_angle(self, axis, degrees):
        ang = 37.5 if degrees else 0.65
        ours = RotateAxisAngle(ang, axis=axis, degrees=degrees)
        ref = RefRotateAxisAngle(ang, axis=axis, degrees=degrees)
        _assert_tfms_match(ours, ref)

    def test_scale_nonuniform_args(self):
        ours = Scale(0.5, 2.0, -1.0)
        ref = RefScale(0.5, 2.0, -1.0)
        _assert_tfms_match(ours, ref)

    def test_transform_points_eps(self):
        """Projective transform with near-zero w: eps clamping matches."""
        m = np.eye(4, dtype=np.float32)
        m[3, 3] = 0.0
        m[2, 3] = 1.0  # w = z
        pts = np.array([[[1.0, 2.0, 1e-9], [3.0, 4.0, 2.0]]], np.float32)
        ours = Transform3d.create(matrix=jnp.asarray(m[None]))
        ref = RefTransform3d(matrix=torch.from_numpy(m)[None])
        for eps in (None, 1e-4):
            got = ours.transform_points(jnp.asarray(pts), eps=eps)
            want = ref.transform_points(torch.from_numpy(pts), eps=eps)
            got, want = np.asarray(got), t2n(want)
            finite = np.isfinite(want)
            np.testing.assert_allclose(
                got[finite], want[finite], rtol=2e-4
            )

    def test_getitem_and_len(self):
        b = Rotate(jnp.asarray(ROT))
        rb = RefRotate(torch.from_numpy(ROT))
        assert len(b) == len(rb) == 2
        np.testing.assert_allclose(
            np.asarray(b[1].get_matrix()), t2n(rb[1].get_matrix()), atol=1e-6
        )
