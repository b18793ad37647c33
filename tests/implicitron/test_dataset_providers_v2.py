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
