"""Dataset provider V2 tests on synthetic CO3Dv2-format data.

Mirrors reference tests/implicitron/test_data_json_index.py scenarios:
set_lists subset extraction, eval-batch index mapping, test_on_train /
only_test_set modes, known-view extension, multi-category joins, and the
eval-batch-driven test loader.
"""

import gzip
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_tpu.implicitron.dataset.json_index_dataset_map_provider_v2 import (
    JsonIndexDatasetMapProviderV2,
    get_available_subset_names,
)
from pytorch3d_tpu.implicitron.dataset.train_eval_data_loader_provider import (
    TrainEvalDataLoaderMapProvider,
)


def _write_category(root, category, n_seq=2, n_frames=6):
    cdir = os.path.join(root, category)
    os.makedirs(os.path.join(cdir, "set_lists"), exist_ok=True)
    os.makedirs(os.path.join(cdir, "eval_batches"), exist_ok=True)
    frames, seqs = [], []
    for s in range(n_seq):
        seq = f"{category}_seq{s}"
        seqs.append({"sequence_name": seq, "category": category})
        for i in range(n_frames):
            frames.append(
                {
                    "sequence_name": seq,
                    "frame_number": i,
                    "image": {"path": f"{seq}/images/frame{i:05d}.jpg"},
                    "viewpoint": {
                        "R": np.eye(3).tolist(),
                        "T": [0.0, 0.0, float(2 + i)],
                        "focal_length": [1.0, 1.0],
                        "principal_point": [0.0, 0.0],
                    },
                }
            )
    with gzip.open(
        os.path.join(cdir, "frame_annotations.jgz"), "wt", encoding="utf8"
    ) as f:
        json.dump(frames, f)
    with gzip.open(
        os.path.join(cdir, "sequence_annotations.jgz"), "wt", encoding="utf8"
    ) as f:
        json.dump(seqs, f)

    def entry(s, i):
        seq = f"{category}_seq{s}"
        return [seq, i, f"{seq}/images/frame{i:05d}.jpg"]

    set_lists = {
        "train": [entry(s, i) for s in range(n_seq) for i in range(4)],
        "val": [entry(s, 4) for s in range(n_seq)],
        "test": [entry(s, i) for s in range(n_seq) for i in (4, 5)],
    }
    with open(
        os.path.join(cdir, "set_lists", "set_lists_manyview_dev_0.json"), "w"
    ) as f:
        json.dump(set_lists, f)
    eval_batches = [[entry(s, 5)] for s in range(n_seq)]
    with open(
        os.path.join(
            cdir, "eval_batches", "eval_batches_manyview_dev_0.json"
        ),
        "w",
    ) as f:
        json.dump(eval_batches, f)
    return set_lists, eval_batches


@pytest.fixture()
def co3d_root(tmp_path):
    root = str(tmp_path / "co3d")
    _write_category(root, "apple")
    _write_category(root, "banana")
    return root


def _provider(root, **kw):
    return JsonIndexDatasetMapProviderV2(
        category=kw.pop("category", "apple"),
        subset_name="manyview_dev_0",
        dataset_root=root,
        dataset_args=dict(load_images=False, load_masks=False),
        **kw,
    )


class TestJsonIndexV2:
    def test_subset_extraction(self, co3d_root):
        dm = _provider(co3d_root).get_dataset_map()
        assert len(dm.train) == 8  # 2 seqs x 4 train frames
        assert len(dm.val) == 2
        assert len(dm.test) == 4
        fd = dm.train[0]
        assert fd.sequence_name == "apple_seq0"
        assert fd.camera is not None

    def test_available_subsets(self, co3d_root):
        assert get_available_subset_names(co3d_root, "apple") == [
            "manyview_dev_0"
        ]
        with pytest.raises(ValueError):
            get_available_subset_names(co3d_root, "nonexistent")

    def test_unknown_subset_raises(self, co3d_root):
        with pytest.raises(ValueError, match="Unknown subset"):
            JsonIndexDatasetMapProviderV2(
                category="apple",
                subset_name="wrong",
                dataset_root=co3d_root,
            )

    def test_eval_batches_mapped_to_indices(self, co3d_root):
        dm = _provider(co3d_root).get_dataset_map()
        eb = dm.test.get_eval_batches()
        assert eb is not None and len(eb) == 2
        for batch in eb:
            fd = dm.test[batch[0]]
            assert fd.frame_number == 5

    def test_test_on_train(self, co3d_root):
        dm = _provider(co3d_root, test_on_train=True).get_dataset_map()
        assert dm.val is dm.train and dm.test is dm.train

    def test_only_test_set(self, co3d_root):
        dm = _provider(co3d_root, only_test_set=True).get_dataset_map()
        assert dm.train is None and len(dm.test) == 4

    def test_exclusive_flags_raise(self, co3d_root):
        with pytest.raises(ValueError):
            _provider(co3d_root, only_test_set=True, test_on_train=True)

    def test_known_view_extension(self, co3d_root):
        dm = _provider(
            co3d_root, n_known_frames_for_test=2
        ).get_dataset_map()
        eb = dm.test.get_eval_batches()
        # each eval batch extended with 2 known train frames
        assert all(len(b) == 3 for b in eb)
        for batch in eb:
            target = dm.test[batch[0]]
            assert target.frame_number == 5
            for i in batch[1:]:
                known = dm.test[i]
                assert known.frame_number < 4  # train frames
                assert known.sequence_name == target.sequence_name

    def test_multi_category_join(self, co3d_root):
        dm = _provider(
            co3d_root, category="apple, banana"
        ).get_dataset_map()
        assert len(dm.train) == 16
        eb = dm.test.get_eval_batches()
        assert len(eb) == 4
        seqs = {dm.test[b[0]].sequence_name for b in eb}
        assert any(s.startswith("apple") for s in seqs)
        assert any(s.startswith("banana") for s in seqs)

    def test_all_train_cameras(self, co3d_root):
        prov = _provider(co3d_root)
        cams = prov.get_all_train_cameras()
        assert cams.R.shape[0] == 8


class TestTrainEvalLoader:
    def test_test_loader_uses_eval_batches(self, co3d_root):
        dm = _provider(co3d_root).get_dataset_map()
        loaders = TrainEvalDataLoaderMapProvider(
            batch_size=2, train_num_batches=3
        ).get_data_loader_map(dm)
        test_batches = list(loaders["test"])
        assert len(test_batches) == 2  # one per eval batch
        for fd in test_batches:
            assert int(np.asarray(fd.frame_number).reshape(-1)[0]) == 5
        assert len(list(loaders["train"])) == 3


class TestSingleSceneProvider:
    def test_splits_and_eval_batches(self):
        from pytorch3d_tpu.implicitron.dataset.single_sequence_dataset import (
            SingleSceneDatasetMapProviderBase,
        )
        from pytorch3d_tpu.renderer import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )

        class _Toy(SingleSceneDatasetMapProviderBase):
            def _load_data(self):
                n = 10
                self.images = [
                    jnp.full((8, 8, 3), i / 10.0) for i in range(n)
                ]
                self.fg_probabilities = None
                poses = []
                for i in range(n):
                    R, T = look_at_view_transform(
                        dist=2.7, azim=36.0 * i
                    )
                    poses.append(FoVPerspectiveCameras.create(R=R, T=T))
                self.poses = poses
                self.i_split = [list(range(6)), [6, 7], [8, 9]]

        prov = _Toy(object_name="toy", n_known_frames_for_test=2)
        dm = prov.get_dataset_map()
        assert len(dm.train) == 6
        assert dm.train[0].frame_type == "train_known"
        # test set extended with the 6 known train frames
        assert len(dm.test) == 2 + 6
        assert dm.test[0].frame_type == "test_unseen"
        assert dm.test[2].frame_type == "train_known"
        eb = dm.test.get_eval_batches()
        assert eb is not None and all(len(b) == 3 for b in eb)
        cams = prov.get_all_train_cameras()
        assert cams.R.shape[0] == 6


class TestFrameDataBuildPipeline:
    """Crop/resize FrameData builder (reference frame_data.py:791 +
    dataset/utils.py): mask-driven box crop, camera refocus, aspect-
    preserving resize with zero padding and mask_crop."""

    def _write_frame(self, tmp_path, W=80, H=60):
        import numpy as np
        from PIL import Image

        root = str(tmp_path / "data")
        os.makedirs(os.path.join(root, "seq/images"), exist_ok=True)
        os.makedirs(os.path.join(root, "seq/masks"), exist_ok=True)
        img = np.zeros((H, W, 3), np.uint8)
        img[20:40, 30:60] = [255, 128, 0]  # the object
        Image.fromarray(img).save(os.path.join(root, "seq/images/f0.png"))
        mask = np.zeros((H, W), np.uint8)
        mask[20:40, 30:60] = 255
        Image.fromarray(mask).save(os.path.join(root, "seq/masks/f0.png"))
        frames = [
            dict(
                sequence_name="seq",
                frame_number=0,
                image=dict(path="seq/images/f0.png"),
                mask=dict(path="seq/masks/f0.png"),
                viewpoint=dict(
                    R=np.eye(3).tolist(),
                    T=[0.0, 0.0, 3.0],
                    focal_length=[2.0, 2.0],
                    principal_point=[0.0, 0.0],
                ),
            )
        ]
        fa = os.path.join(root, "frame_annotations.jgz")
        with gzip.open(fa, "wt", encoding="utf8") as f:
            json.dump(frames, f)
        return root, fa

    def test_no_crop_resize_pads_and_masks(self, tmp_path):
        from pytorch3d_tpu.implicitron.dataset.json_index_dataset import (
            JsonIndexDataset,
        )

        root, fa = self._write_frame(tmp_path)
        ds = JsonIndexDataset(
            frame_annotations_file=fa, dataset_root=root,
            image_height=64, image_width=64,
        )
        fd = ds[0]
        assert fd.image_rgb.shape == (1, 64, 64, 3)
        # 80x60 -> scale 0.8 -> 48x64 valid, bottom 16 rows padded
        mc = np.asarray(fd.mask_crop[0, ..., 0])
        assert mc[:48].min() == 1.0 and mc[48:].max() == 0.0
        assert float(np.asarray(fd.image_rgb)[0, 48:].max()) == 0.0

    def test_box_crop_zooms_and_refocuses(self, tmp_path):
        from pytorch3d_tpu.implicitron.dataset.json_index_dataset import (
            JsonIndexDataset,
        )

        root, fa = self._write_frame(tmp_path)
        ds = JsonIndexDataset(
            frame_annotations_file=fa, dataset_root=root,
            image_height=64, image_width=64,
            box_crop=True, box_crop_context=0.1,
        )
        fd = ds[0]
        # foreground fills most of the cropped view
        fg = np.asarray(fd.fg_probability[0, ..., 0])
        mc = np.asarray(fd.mask_crop[0, ..., 0])
        frac = fg[mc > 0].mean()
        assert frac > 0.5, f"fg fraction after crop {frac}"
        assert fd.bbox_xywh is not None and fd.crop_bbox_xywh is not None
        np.testing.assert_allclose(
            np.asarray(fd.bbox_xywh), [30, 20, 30, 20]
        )
        # camera intrinsics changed to the crop window
        assert not np.allclose(
            np.asarray(fd.camera.principal_point), [[0.0, 0.0]]
        )
        assert not np.allclose(
            np.asarray(fd.camera.focal_length), [[2.0, 2.0]]
        )

    def test_camera_projection_consistency(self, tmp_path):
        """The object-center world ray must project to the object's pixel
        both before and after crop+resize (the crop/scale camera
        adjustments undo the image-space transforms)."""
        import jax.numpy as jnp

        from pytorch3d_tpu.implicitron.dataset.json_index_dataset import (
            JsonIndexDataset,
        )

        root, fa = self._write_frame(tmp_path)
        ds_plain = JsonIndexDataset(
            frame_annotations_file=fa, dataset_root=root,
            image_height=None, image_width=None,
        )
        ds_crop = JsonIndexDataset(
            frame_annotations_file=fa, dataset_root=root,
            image_height=64, image_width=64,
            box_crop=True, box_crop_context=0.0,
        )
        fd0, fd1 = ds_plain[0], ds_crop[0]

        # pick the world point whose plain projection is the object center
        # (pixel (30, 45) of 80x60): ndc = ((W-1-2x)/min, (H-1-2y)/min)
        W0, H0 = 80, 60
        px, py = 45.0, 30.0
        x_ndc = (W0 - 1 - 2 * px) / min(W0, H0)
        y_ndc = (H0 - 1 - 2 * py) / min(W0, H0)
        z = 3.0
        f = 2.0
        pt_world = jnp.asarray(
            [[x_ndc * z / f, y_ndc * z / f, 0.0]]
        )  # T adds z=3

        def project_px(fd, W, H):
            xy = fd.camera.transform_points_ndc(pt_world[None])[0, 0, :2]
            s = min(H, W)
            col = (W - 1 - float(xy[0]) * s) / 2.0
            row = (H - 1 - float(xy[1]) * s) / 2.0
            return col, row

        c0, r0 = project_px(fd0, W0, H0)
        np.testing.assert_allclose([c0, r0], [px, py], atol=0.2)
        # after crop+resize the same world point lands on the object
        # center of the transformed image
        c1, r1 = project_px(fd1, 64, 64)
        fg = np.asarray(fd1.fg_probability[0, ..., 0])
        ys, xs = np.nonzero(fg > 0.5)
        cx, cy = xs.mean(), ys.mean()
        np.testing.assert_allclose([c1, r1], [cx, cy], atol=1.5)
