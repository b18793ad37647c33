"""Core-package surface completion: reference-named rasterizer helpers,
rectangle packing (parity vs the reference's own pure-python packer),
ClipFrustum, TexturesBase, GatherScatter, format_tensor, plotly config
classes, align_bbox, gltf load_meshes, texturesuv_image_PIL."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_compat import import_reference  # noqa: E402

import_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _check_packing_valid(sizes, packed):
    """Every rectangle in-bounds, pairwise disjoint, correct footprint."""
    total_w, total_h = packed.total_size
    boxes = []
    for (xs, ys), loc in zip(sizes, packed.locations):
        w, h = (ys, xs) if loc.flipped else (xs, ys)
        assert loc.x >= 0 and loc.y >= 0
        assert loc.x + w <= total_w and loc.y + h <= total_h
        boxes.append((loc.x, loc.y, loc.x + w, loc.y + h))
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            overlap = (
                a[0] < b[2] and b[0] < a[2] and a[1] < b[3] and b[1] < a[3]
            )
            assert not overlap, (i, j, a, b)


class TestPackRectanglesParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_valid_and_competitive_with_reference(self, seed):
        from pytorch3d.renderer.mesh.utils import (
            pack_rectangles as ref_pack,
        )

        from pytorch3d_tpu.renderer.mesh.utils import pack_rectangles

        rng = np.random.RandomState(seed)
        sizes = [
            (int(rng.randint(1, 20)), int(rng.randint(1, 20)))
            for _ in range(8)
        ]
        ours = pack_rectangles(sizes)
        _check_packing_valid(sizes, ours)
        # Different algorithm (shelf-first-fit), so placements differ from
        # the reference; require the packed area to be no more than 2x the
        # reference packer's (both are heuristics; in practice comparable).
        ref = ref_pack(sizes)
        our_area = ours.total_size[0] * ours.total_size[1]
        ref_area = ref.total_size[0] * ref.total_size[1]
        assert our_area <= 2 * ref_area

    def test_degenerate_and_errors(self):
        from pytorch3d_tpu.renderer.mesh.utils import pack_rectangles

        with pytest.raises(ValueError):
            pack_rectangles([(3, 4)])
        sizes = [(5, 1), (1, 5), (2, 2), (7, 7), (1, 1)]
        _check_packing_valid(sizes, pack_rectangles(sizes))

    def test_unique(self):
        from pytorch3d.renderer.mesh.utils import (
            Rectangle as RefRectangle,
            pack_unique_rectangles as ref_pack_unique,
        )

        from pytorch3d_tpu.renderer.mesh.utils import (
            Rectangle,
            pack_unique_rectangles,
        )

        rects = [(4, 6, 1), (4, 6, 1), (3, 3, 2), (8, 2, 3)]
        ours = pack_unique_rectangles([Rectangle(*r) for r in rects])
        ref = ref_pack_unique([RefRectangle(*r) for r in rects])
        # duplicates share a location; only the first is is_first
        assert [l.is_first for l in ours.locations] == [
            l.is_first for l in ref.locations
        ]
        assert (ours.locations[0].x, ours.locations[0].y) == (
            ours.locations[1].x,
            ours.locations[1].y,
        )
        # the deduplicated placements must themselves be a valid packing
        _check_packing_valid(
            [(4, 6), (3, 3), (8, 2)],
            type(ours)(ours.total_size, [ours.locations[i] for i in (0, 2, 3)]),
        )


class TestRasterHelpers:
    def test_barycentric_matches_reference(self):
        import torch
        from pytorch3d.renderer.mesh.rasterize_meshes import (
            barycentric_coordinates as ref_bary,
            barycentric_coordinates_clip as ref_clip,
            point_line_distance as ref_pld,
            point_triangle_distance as ref_ptd,
        )

        from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
            barycentric_coordinates,
            barycentric_coordinates_clip,
            point_line_distance,
            point_triangle_distance,
        )

        rng = np.random.RandomState(0)
        p, v0, v1, v2 = [rng.randn(2).astype(np.float32) for _ in range(4)]
        ours = barycentric_coordinates(
            jnp.asarray(p), jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
        )
        ref = ref_bary(*(torch.from_numpy(x) for x in (p, v0, v1, v2)))
        np.testing.assert_allclose(
            [float(x) for x in ours], [float(x) for x in ref], rtol=1e-4
        )
        oc = barycentric_coordinates_clip(ours)
        rc = ref_clip(ref)
        np.testing.assert_allclose(
            [float(x) for x in oc], [float(x) for x in rc], rtol=1e-4
        )
        np.testing.assert_allclose(
            float(point_line_distance(jnp.asarray(p), jnp.asarray(v0), jnp.asarray(v1))),
            float(ref_pld(*(torch.from_numpy(x) for x in (p, v0, v1)))),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(point_triangle_distance(
                jnp.asarray(p), jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))),
            float(ref_ptd(*(torch.from_numpy(x) for x in (p, v0, v1, v2)))),
            rtol=1e-4,
        )

    def test_rasterize_meshes_python_alias(self):
        from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
            rasterize_meshes,
            rasterize_meshes_python,
        )
        from pytorch3d_tpu.utils import ico_sphere

        m = ico_sphere(0)
        a = rasterize_meshes_python(m, image_size=16, faces_per_pixel=1)
        b = rasterize_meshes(m, image_size=16, faces_per_pixel=1, bin_size=0)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_clip_frustum(self):
        from pytorch3d_tpu.renderer.mesh.clip import ClipFrustum

        f = ClipFrustum(left=-1, right=1, z_clip_value=0.05, cull=True)
        assert f.left == -1 and f.z_clip_value == 0.05 and f.cull

    def test_interpolate_zbuf_and_clip_bary(self):
        from pytorch3d_tpu.renderer.mesh.rasterize_meshes import (
            rasterize_meshes,
        )
        from pytorch3d_tpu.renderer.mesh.utils import (
            _clip_barycentric_coordinates,
            _interpolate_zbuf,
        )
        from pytorch3d_tpu.utils import ico_sphere

        m = ico_sphere(0)
        pix, zbuf, bary, dists = rasterize_meshes(
            m, image_size=16, faces_per_pixel=1, bin_size=0,
            blur_radius=0.01,
        )
        cb = _clip_barycentric_coordinates(bary)
        s = np.asarray(cb.sum(axis=-1))[np.asarray(pix) >= 0]
        np.testing.assert_allclose(s, 1.0, atol=1e-4)
        z2 = _interpolate_zbuf(pix, cb, m)
        assert np.isfinite(np.asarray(z2)).all()
        assert (np.asarray(z2)[np.asarray(pix) < 0] == -1).all()


class TestSmallSurface:
    def test_gather_scatter_class(self):
        from pytorch3d_tpu.ops.graph_conv import GatherScatter, gather_scatter

        v = jnp.asarray(np.random.RandomState(0).rand(4, 3).astype(np.float32))
        e = jnp.asarray([[0, 1], [1, 2], [2, 3]])
        np.testing.assert_allclose(
            np.asarray(GatherScatter()(v, e)),
            np.asarray(gather_scatter(v, e, False)),
        )

    def test_format_tensor_and_broadcast(self):
        from pytorch3d_tpu.renderer.utils import (
            convert_to_tensors_and_broadcast,
            format_tensor,
        )

        assert format_tensor(2.0).shape == (1,)
        a, b = convert_to_tensors_and_broadcast(1.0, jnp.ones((4, 2)))
        assert a.shape == (4,) and b.shape == (4, 2)
        with pytest.raises(ValueError):
            convert_to_tensors_and_broadcast(jnp.ones(3), jnp.ones(4))

    def test_textured_soft_phong_alias(self):
        from pytorch3d_tpu.renderer.mesh.shader import (
            SoftPhongShader,
            TexturedSoftPhongShader,
        )

        with pytest.warns(PendingDeprecationWarning):
            s = TexturedSoftPhongShader()
        assert isinstance(s, SoftPhongShader)

    def test_textures_base(self):
        from pytorch3d_tpu.renderer.mesh.textures import (
            TexturesAtlas,
            TexturesBase,
            TexturesUV,
            TexturesVertex,
        )

        t = TexturesVertex.create(jnp.ones((1, 3, 3)))
        assert isinstance(t, TexturesBase)
        a = TexturesAtlas.create(jnp.ones((1, 2, 1, 1, 3)))
        assert isinstance(a, TexturesBase)

    def test_align_bbox(self):
        import torch
        from pytorch3d.datasets.r2n2.utils import align_bbox as ref_align

        from pytorch3d_tpu.datasets.r2n2.utils import align_bbox

        rng = np.random.RandomState(2)
        src = rng.randn(20, 3).astype(np.float32)
        tgt = (rng.randn(30, 3) * 2 + 1).astype(np.float32)
        ours = align_bbox(jnp.asarray(src), jnp.asarray(tgt))
        ref = ref_align(torch.from_numpy(src), torch.from_numpy(tgt))
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_plotly_config_and_wireframe(self):
        # (the reference's plotly_vis needs the plotly package, absent
        # here — check the documented wireframe values directly)
        from pytorch3d_tpu.vis.plotly_vis import (
            AxisArgs,
            Lighting,
            get_camera_wireframe,
        )

        assert AxisArgs().backgroundcolor == "#fff"
        assert Lighting().ambient == 0.8
        w = np.asarray(get_camera_wireframe(1.0))
        assert w.shape == (15, 3)
        np.testing.assert_allclose(w[0], [-1.0, 0.75, 2.0])  # 0.5*(-2,1.5,4)
        np.testing.assert_allclose(w[-1], [0.0, 0.0, 3.0])  # F

    def test_gltf_load_meshes(self, tmp_path):
        from pytorch3d_tpu.io import IO
        from pytorch3d_tpu.io.experimental_gltf_io import load_meshes
        from pytorch3d_tpu.utils import ico_sphere

        path = str(tmp_path / "s.glb")
        IO().save_mesh(ico_sphere(0), path)
        out = load_meshes(path)
        assert len(out) == 1
        name, mesh = out[0]
        assert mesh.verts_padded().shape[1] == 12

    def test_texturesuv_image_pil(self):
        from pytorch3d_tpu.renderer import TexturesUV
        from pytorch3d_tpu.vis.texture_vis import texturesuv_image_PIL

        rng = np.random.RandomState(3)
        tex = TexturesUV.create(
            maps=jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32)),
            faces_uvs=[jnp.asarray(rng.randint(0, 5, (4, 3)))],
            verts_uvs=[jnp.asarray(rng.rand(5, 2).astype(np.float32))],
        )
        img = texturesuv_image_PIL(tex)
        assert img.size == (16, 16)
