"""Dataset-layer surface completion: typed annotations (types.py),
FrameDataBuilder, SqlIndexDatasetMapProvider, DataLoaderMap providers,
DoublePoolBatchSampler, dataset loaders (16-bit depth etc.),
get_implicitron_sequence_pointcloud, and the DBIR eval_demo entry —
on synthetic CO3D-format data with real image/depth/mask files."""

import gzip
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _write_frame_files(root, seq, i, H=12, W=12):
    """Write real jpg/png blobs for one frame; returns annotation dict."""
    from PIL import Image

    img_dir = os.path.join(root, seq, "images")
    mask_dir = os.path.join(root, seq, "masks")
    depth_dir = os.path.join(root, seq, "depths")
    for d in (img_dir, mask_dir, depth_dir):
        os.makedirs(d, exist_ok=True)
    rgb = (np.random.RandomState(i).rand(H, W, 3) * 255).astype(np.uint8)
    img_path = f"{seq}/images/frame{i:05d}.png"
    Image.fromarray(rgb).save(os.path.join(root, img_path))
    mask = np.zeros((H, W), np.uint8)
    mask[2:-2, 2:-2] = 255
    mask_path = f"{seq}/masks/frame{i:05d}.png"
    Image.fromarray(mask).save(os.path.join(root, mask_path))
    # 16-bit float16-reinterpreted depth png (CO3D format)
    depth = np.full((H, W), 2.0 + 0.1 * i, np.float16)
    depth_u16 = depth.view(np.uint16)
    depth_path = f"{seq}/depths/frame{i:05d}.png"
    Image.fromarray(depth_u16, mode="I;16").save(
        os.path.join(root, depth_path)
    )
    return {
        "sequence_name": seq,
        "frame_number": i,
        "frame_timestamp": float(i),
        "image": {"path": img_path, "size": [H, W]},
        "mask": {"path": mask_path},
        "depth": {"path": depth_path, "scale_adjustment": 1.0},
        "viewpoint": {
            "R": np.eye(3).tolist(),
            "T": [0.0, 0.0, float(2 + 0.3 * i)],
            "focal_length": [1.0, 1.0],
            "principal_point": [0.0, 0.0],
        },
    }


@pytest.fixture()
def blob_category(tmp_path):
    """A CO3Dv2-format category directory with real blobs."""
    category = "toy"
    root = str(tmp_path)
    cdir = os.path.join(root, category)
    os.makedirs(os.path.join(cdir, "set_lists"), exist_ok=True)
    frames, seqs = [], []
    for s in range(1):
        seq = f"{category}_seq{s}"
        seqs.append({"sequence_name": seq, "category": category})
        for i in range(5):
            frames.append(_write_frame_files(root, os.path.join(category, seq), i) | {"sequence_name": seq})
    # fix paths: _write_frame_files used category/seq prefix already
    with gzip.open(
        os.path.join(cdir, "frame_annotations.jgz"), "wt", encoding="utf8"
    ) as f:
        json.dump(frames, f)
    with gzip.open(
        os.path.join(cdir, "sequence_annotations.jgz"), "wt", encoding="utf8"
    ) as f:
        json.dump(seqs, f)
    set_lists = {
        "train": [[f["sequence_name"], f["frame_number"], f["image"]["path"]]
                  for f in frames[:3]],
        "val": [[frames[3]["sequence_name"], 3, frames[3]["image"]["path"]]],
        "test": [[frames[3]["sequence_name"], 3, frames[3]["image"]["path"]],
                 [frames[4]["sequence_name"], 4, frames[4]["image"]["path"]]],
    }
    with open(
        os.path.join(cdir, "set_lists", "set_lists_manyview_dev_0.json"), "w"
    ) as f:
        json.dump(set_lists, f)
    return root, category, frames


class TestLoaders:
    def test_16bit_depth_roundtrip(self, blob_category):
        from pytorch3d_tpu.implicitron.dataset.utils import (
            load_16big_png_depth,
            load_depth,
            load_image,
            load_mask,
        )

        root, category, frames = blob_category
        dpath = os.path.join(root, frames[2]["depth"]["path"])
        d = load_16big_png_depth(dpath)
        np.testing.assert_allclose(d, 2.2, atol=1e-2)
        d2 = load_depth(dpath, 2.0)
        assert d2.shape[0] == 1
        np.testing.assert_allclose(d2[0], 4.4, atol=2e-2)
        img = load_image(os.path.join(root, frames[0]["image"]["path"]))
        assert img.shape[0] == 3 and img.max() <= 1.0
        m = load_mask(os.path.join(root, frames[0]["mask"]["path"]))
        assert m.shape[0] == 1 and set(np.unique(m)) <= {0.0, 1.0}


class TestFrameDataBuilder:
    def test_build_from_annotation(self, blob_category):
        from pytorch3d_tpu.implicitron.dataset.frame_data import (
            FrameDataBuilder,
        )

        root, category, frames = blob_category
        builder = FrameDataBuilder(
            dataset_root=root, image_height=8, image_width=8
        )
        fd = builder.build(frames[0], sequence_category=category)
        assert fd.image_rgb.shape == (1, 8, 8, 3)
        assert fd.fg_probability.shape == (1, 8, 8, 1)
        assert fd.depth_map.shape == (1, 8, 8, 1)
        assert fd.camera is not None
        assert fd.sequence_category == category

    def test_build_from_typed_annotation(self, blob_category):
        from typing import List

        from pytorch3d_tpu.implicitron.dataset.frame_data import (
            FrameDataBuilder,
        )
        from pytorch3d_tpu.implicitron.dataset.types import (
            FrameAnnotation,
            load_dataclass_jgzip,
        )

        root, category, frames = blob_category
        typed = load_dataclass_jgzip(
            os.path.join(root, category, "frame_annotations.jgz"),
            List[FrameAnnotation],
        )
        assert isinstance(typed[0], FrameAnnotation)
        builder = FrameDataBuilder(
            dataset_root=root, image_height=8, image_width=8
        )
        fd = builder.build(typed[1], sequence_category=category)
        assert fd.image_rgb is not None and fd.frame_number == 1


class TestSqlProvider:
    def test_sql_map_provider_splits(self, blob_category, tmp_path):
        from pytorch3d_tpu.implicitron.dataset.sql_dataset import (
            write_sql_dataset,
        )
        from pytorch3d_tpu.implicitron.dataset.sql_dataset_provider import (
            SqlIndexDatasetMapProvider,
        )

        root, category, frames = blob_category
        db = str(tmp_path / "annots.sqlite")
        write_sql_dataset(
            db, frames, [{"sequence_name": frames[0]["sequence_name"],
                          "category": category}]
        )
        set_lists = os.path.join(
            root, category, "set_lists", "set_lists_manyview_dev_0.json"
        )
        provider = SqlIndexDatasetMapProvider(
            sqlite_metadata_file=db,
            dataset_root=root,
            subset_list_file=set_lists,
        )
        dmap = provider.get_dataset_map()
        assert len(dmap["train"]) == 3
        assert len(dmap["val"]) == 1
        assert len(dmap["test"]) == 2
        fd = dmap["train"][0]
        assert fd.camera is not None
        # test_on_train aliases the train split
        provider2 = SqlIndexDatasetMapProvider(
            sqlite_metadata_file=db,
            dataset_root=root,
            subset_list_file=set_lists,
            test_on_train=True,
        )
        dmap2 = provider2.get_dataset_map()
        assert len(dmap2["test"]) == len(dmap2["train"])


class TestDataLoaderProviders:
    def test_simple_provider(self, blob_category):
        from pytorch3d_tpu.implicitron.dataset.data_loader_map_provider import (  # noqa: E501
            SimpleDataLoaderMapProvider,
        )
        from pytorch3d_tpu.implicitron.dataset.json_index_dataset import (
            JsonIndexDataset,
        )
        from pytorch3d_tpu.implicitron.dataset.dataset_base import DatasetMap

        root, category, frames = blob_category
        ds = JsonIndexDataset(
            frame_annotations_file=os.path.join(
                root, category, "frame_annotations.jgz"
            ),
            dataset_root=root,
            image_height=8,
            image_width=8,
        )
        provider = SimpleDataLoaderMapProvider(batch_size=2)
        lm = provider.get_data_loader_map(
            DatasetMap(train=ds, val=None, test=ds)
        )
        assert lm["val"] is None
        batches = list(lm["train"])
        assert sum(b.image_rgb.shape[0] for b in batches) == len(ds)

    def test_double_pool_sampler_props(self):
        from pytorch3d_tpu.implicitron.dataset.data_loader_map_provider import (  # noqa: E501
            DoublePoolBatchSampler,
        )

        s = DoublePoolBatchSampler(
            [10, 11], [20, 21, 22], batch_size=3, replacement=True,
            num_batches=5, seed=1,
        )
        batches = list(s)
        assert len(batches) == 5
        for b in batches:
            assert b[0] in (10, 11)
            assert len(set(b[1:])) == 2  # rest sampled without replacement
        with pytest.raises(ValueError):
            DoublePoolBatchSampler([0], [1], batch_size=3, replacement=False)


class TestSequencePointcloudAndEvalDemo:
    def test_get_implicitron_sequence_pointcloud(self, blob_category):
        from pytorch3d_tpu.implicitron.dataset.json_index_dataset import (
            JsonIndexDataset,
        )
        from pytorch3d_tpu.implicitron.dataset.visualize import (
            get_implicitron_sequence_pointcloud,
        )

        root, category, frames = blob_category
        ds = JsonIndexDataset(
            frame_annotations_file=os.path.join(
                root, category, "frame_annotations.jgz"
            ),
            dataset_root=root,
            image_height=8,
            image_width=8,
        )
        pcl, fd = get_implicitron_sequence_pointcloud(
            ds, sequence_name=frames[0]["sequence_name"]
        )
        assert pcl.points_padded().shape[-1] == 3
        assert pcl.points_padded().shape[1] > 0
        assert fd.image_rgb.shape[0] == len(frames)

    def test_eval_demo_dbir(self, blob_category):
        from pytorch3d_tpu.implicitron.eval_demo import (
            evaluate_dbir_for_category,
        )

        root, category, frames = blob_category
        result = evaluate_dbir_for_category(
            data_source_args={
                "dataset_map_provider_class_type": "JsonIndexDatasetMapProviderV2",
                "dataset_map_provider_args": {
                    "category": category,
                    "subset_name": "manyview_dev_0",
                    "dataset_root": root,
                    "load_eval_batches": False,
                    "dataset_args": {
                        "image_height": 8,
                        "image_width": 8,
                    },
                },
            },
            max_batches=2,
        )
        assert "psnr_masked" in result or "psnr" in result
        for k, v in result.items():
            if isinstance(v, float):
                assert np.isfinite(v) or np.isnan(v)


class TestV1ProviderAndThirdParty:
    def test_json_index_v1_provider(self, blob_category):
        from pytorch3d_tpu.implicitron.dataset.json_index_dataset_map_provider import (  # noqa: E501
            JsonIndexDatasetMapProvider,
        )

        root, category, frames = blob_category
        # rename set_lists file to the V1 naming
        import shutil

        src = os.path.join(
            root, category, "set_lists", "set_lists_manyview_dev_0.json"
        )
        dst = os.path.join(
            root, category, "set_lists", "set_lists_singlesequence.json"
        )
        shutil.copy(src, dst)
        provider = JsonIndexDatasetMapProvider(
            category=category,
            task_str="singlesequence",
            dataset_root=root,
            assert_single_seq=True,
            dataset_args={"image_height": 8, "image_width": 8},
        )
        dmap = provider.get_dataset_map()
        assert len(dmap["train"]) == 3 and len(dmap["test"]) == 2
        fd = dmap["test"][0]
        assert fd.image_rgb.shape == (1, 8, 8, 3)

    def test_hyperfc_gradients(self):
        import flax.linen as nn

        from pytorch3d_tpu.implicitron.third_party.hyperlayers import HyperFC

        class Apply(nn.Module):
            @nn.compact
            def __call__(self, latent, x):
                layers = HyperFC(
                    in_ch=3, out_ch=2, hidden_ch=8, hyper_hidden_ch=8,
                    num_hidden_layers=1, outermost_linear=True,
                )(latent)
                for l in layers:
                    x = l(x)
                return x

        m = Apply()
        v = m.init(jax.random.PRNGKey(0), jnp.ones((4,)), jnp.ones((5, 3)))
        loss = lambda p, z: (m.apply(p, z, jnp.ones((5, 3))) ** 2).sum()
        g = jax.grad(loss, argnums=1)(v, jnp.ones((4,)))
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0

    def test_fcblock(self):
        from pytorch3d_tpu.implicitron.third_party.pytorch_prototyping import (
            FCBlock,
        )

        m = FCBlock(hidden_ch=8, num_hidden_layers=2, out_features=5,
                    outermost_linear=True)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((7, 3)))
        assert m.apply(v, jnp.ones((7, 3))).shape == (7, 5)
