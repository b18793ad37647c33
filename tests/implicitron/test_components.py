"""Implicitron auxiliary components: view pooler, global encoders,
feature extractor, evaluation (reference tests/implicitron/test_viewsampling,
test_srn/autodecoder usage, test_evaluation)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_tpu.renderer import (
    FoVPerspectiveCameras,
    PerspectiveCameras,
    look_at_view_transform,
)


class TestViewPooler:
    def _cams(self, v=3):
        R, T = look_at_view_transform(
            dist=2.7,
            elev=jnp.linspace(0.0, 30.0, v),
            azim=jnp.linspace(0.0, 90.0, v),
        )
        return PerspectiveCameras.create(R=R, T=T)

    def test_reduction_constant_maps(self):
        from pytorch3d_tpu.implicitron.models.view_pooler.view_pooler import (
            ViewPooler,
        )

        V, C, H, W = 3, 4, 8, 8
        # constant per-view maps: 1, 2, 3
        feats = {
            "f": jnp.stack(
                [jnp.full((C, H, W), float(i + 1)) for i in range(V)]
            )
        }
        pooler = ViewPooler(
            feature_aggregator_args=dict(reduction_functions=("avg", "std"))
        )
        pts = jnp.zeros((1, 5, 3))  # points at origin project inside all views
        out = pooler(
            pts=pts, camera=self._cams(V), feats=feats, masks=None
        )
        agg = out["f"]  # (1, P, C*2)
        assert agg.shape == (1, 5, C * 2)
        assert pooler.get_aggregated_feature_dim(C, V) == C * 2
        # avg of (1,2,3) = 2; std = sqrt(2/3)
        assert np.allclose(np.asarray(agg[0, :, :C]), 2.0, atol=1e-4)
        assert np.allclose(
            np.asarray(agg[0, :, C:]), np.sqrt(2.0 / 3.0), atol=1e-4
        )

    def test_identity_and_angle_weighted(self):
        from pytorch3d_tpu.implicitron.models.view_pooler.view_pooler import (
            ViewPooler,
        )

        V, C, H, W = 2, 3, 8, 8
        feats = {"f": jnp.ones((V, C, H, W))}
        pts = jnp.zeros((1, 4, 3))
        ident = ViewPooler(feature_aggregator_class_type="IdentityFeatureAggregator")
        out = ident(pts=pts, camera=self._cams(V), feats=feats, masks=None)
        assert out["f"].shape == (1, 4, V * C)
        assert ident.get_aggregated_feature_dim(C, V) == V * C

        ang = ViewPooler(
            feature_aggregator_class_type="AngleWeightedReductionFeatureAggregator",
            feature_aggregator_args=dict(reduction_functions=("avg",)),
        )
        out2 = ang(pts=pts, camera=self._cams(V), feats=feats, masks=None)
        assert out2["f"].shape == (1, 4, C)
        assert np.isfinite(np.asarray(out2["f"])).all()

    def test_view_sampler_samples_projected_position(self):
        """Feature maps encode their own NDC x coordinate — sampling at a
        world point must return (approximately) the point's projected x."""
        from pytorch3d_tpu.implicitron.models.view_pooler.view_sampler import (
            ViewSampler,
        )

        H = W = 33
        cams = self._cams(1)
        # map[0, y, x] = ndc x at that pixel (pytorch3d NDC: +X left)
        xs = jnp.linspace(1.0, -1.0, W)
        fmap = jnp.broadcast_to(xs[None, None, None, :], (1, 1, H, W))
        pts = jnp.asarray([[[0.2, -0.1, 0.05]]])
        sampler = ViewSampler()
        sampled, masks = sampler(pts, None, cams, None, {"f": fmap}, None)
        proj_x = float(cams.transform_points(pts.reshape(1, 1, 3))[0, 0, 0])
        assert abs(float(sampled["f"][0, 0, 0]) - proj_x) < 0.05
        assert masks.shape == (1, 1, 1)


class TestGlobalEncoders:
    def test_sequence_autodecoder(self):
        from pytorch3d_tpu.implicitron.models.global_encoder.global_encoder import (
            SequenceAutodecoder,
        )

        enc = SequenceAutodecoder(encoding_dim=8, n_instances=10)
        params = enc.init(jax.random.PRNGKey(0), sequence_name=["seq_a"])
        assert enc.get_encoding_dim() == 8
        za = enc.apply(params, sequence_name=["seq_a"])
        za2 = enc.apply(params, sequence_name=["seq_a"])
        zb = enc.apply(params, sequence_name=["seq_b"])
        assert za.shape == (1, 8)
        assert np.allclose(np.asarray(za), np.asarray(za2))  # deterministic
        assert not np.allclose(np.asarray(za), np.asarray(zb))

    def test_harmonic_time_encoder(self):
        from pytorch3d_tpu.implicitron.models.global_encoder.global_encoder import (
            HarmonicTimeEncoder,
        )

        enc = HarmonicTimeEncoder(n_harmonic_functions=4)
        params = enc.init(jax.random.PRNGKey(0), frame_timestamp=[0.5])
        z = enc.apply(params, frame_timestamp=[0.5, 1.0])
        assert z.shape == (2, enc.get_encoding_dim())
        assert np.isfinite(np.asarray(z)).all()


class TestFeatureExtractor:
    def test_resnet_feature_extractor(self):
        from pytorch3d_tpu.implicitron.models.feature_extractor.resnet_feature_extractor import (
            ResNetFeatureExtractor,
        )

        fe = ResNetFeatureExtractor()
        img = jnp.ones((2, 32, 32, 3)) * 0.5
        params = fe.init(jax.random.PRNGKey(0), img)
        out = fe.apply(params, img)
        # dict of multi-scale feature maps
        assert isinstance(out, dict) and len(out) >= 1
        for _, f in out.items():
            assert f.shape[0] == 2
            assert np.isfinite(np.asarray(f)).all()

    def test_reference_output_contract(self):
        # reference resnet_feature_extractor.py:141,:224: keys are
        # res_layer_{k} / mask / image, channel-first maps, projected to
        # proj_dim, l2-normalized to 1/sqrt(len(stages)) per stage.
        from pytorch3d_tpu.implicitron.models.feature_extractor.resnet_feature_extractor import (
            ResNetFeatureExtractor,
        )

        fe = ResNetFeatureExtractor(
            arch="resnet18", stages=(1, 2), proj_dim=8, image_rescale=0.5,
            pretrained=False,
        )
        img = jnp.ones((2, 64, 64, 3)) * 0.5
        mask = jnp.ones((2, 64, 64, 1))
        params = fe.init(jax.random.PRNGKey(0), img, mask)
        out = fe.apply(params, img, mask)
        assert set(out) == {"res_layer_1", "res_layer_2", "mask", "image"}
        # image entry is the rescaled input, channel-first
        assert out["image"].shape == (2, 3, 32, 32)
        assert out["mask"].shape == (2, 1, 64, 64)
        # stage maps are projected to proj_dim and stride-correct
        assert out["res_layer_1"].shape == (2, 8, 8, 8)  # /4 of 32
        assert out["res_layer_2"].shape == (2, 8, 4, 4)
        # l2_norm: per-pixel channel norm == 1/sqrt(n_stages)
        n = np.linalg.norm(np.asarray(out["res_layer_1"]), axis=1)
        np.testing.assert_allclose(n, 1 / np.sqrt(2), atol=1e-5)
        assert fe.get_feat_dims() == 8 + 8 + 1 + 3

    def test_resnet50_bottleneck_and_native_dims(self):
        from pytorch3d_tpu.implicitron.models.feature_extractor.resnet_feature_extractor import (
            ResNetFeatureExtractor,
        )

        fe = ResNetFeatureExtractor(
            arch="resnet50", stages=(1,), proj_dim=0, image_rescale=1.0,
            l2_norm=False, add_images=False, pretrained=False,
        )
        img = jnp.ones((1, 32, 32, 3)) * 0.2
        params = fe.init(jax.random.PRNGKey(0), img)
        out = fe.apply(params, img)
        # proj_dim=0 -> native bottleneck width (256 for resnet50 stage 1)
        assert out["res_layer_1"].shape[1] == 256
        assert fe.get_feat_dims() == 256 + 1

    def test_torch_state_dict_import(self):
        # params_from_torch_state_dict maps torchvision names onto the
        # flax tree (OIHW->HWIO kernels, BN running stats -> FrozenBN).
        from pytorch3d_tpu.implicitron.models.feature_extractor.resnet_feature_extractor import (
            ResNetFeatureExtractor,
            params_from_torch_state_dict,
        )

        fe = ResNetFeatureExtractor(
            arch="resnet18", stages=(1,), proj_dim=0, image_rescale=1.0,
            l2_norm=False, add_images=False, add_masks=False,
            normalize_image=False, pretrained=False,
        )
        img = jnp.ones((1, 32, 32, 3)) * 0.3
        params = fe.init(jax.random.PRNGKey(0), img)

        rng = np.random.RandomState(0)
        sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{leaf}"] = np.abs(rng.randn(64)).astype(np.float32)
        for b in range(2):  # resnet18 stage 1: two BasicBlocks, 64ch
            for i in (1, 2):
                sd[f"layer1.{b}.conv{i}.weight"] = rng.randn(
                    64, 64, 3, 3
                ).astype(np.float32)
                for leaf in ("weight", "bias", "running_mean",
                             "running_var"):
                    sd[f"layer1.{b}.bn{i}.{leaf}"] = np.abs(
                        rng.randn(64)
                    ).astype(np.float32)

        newp = params_from_torch_state_dict(params, sd, arch="resnet18")
        tree = newp["params"]
        np.testing.assert_allclose(
            np.asarray(tree["stem_conv"]["kernel"]),
            sd["conv1.weight"].transpose(2, 3, 1, 0),
        )
        np.testing.assert_allclose(
            np.asarray(tree["layer1_block1"]["bn2"]["mean"]),
            sd["layer1.1.bn2.running_mean"],
        )
        out = fe.apply(newp, img)  # imported tree still runs
        assert np.isfinite(np.asarray(out["res_layer_1"])).all()


class TestEvaluation:
    def test_eval_batch_metrics(self):
        from pytorch3d_tpu.implicitron.dataset.frame_data import FrameData
        from pytorch3d_tpu.implicitron.evaluation.evaluate_new_view_synthesis import (
            eval_batch,
        )

        H = W = 16
        gt = jnp.ones((1, H, W, 3)) * 0.5
        mask = jnp.zeros((1, H, W, 1)).at[:, 4:12, 4:12].set(1.0)
        fd = FrameData(image_rgb=gt, fg_probability=mask)
        # perfect prediction -> very high psnr; half-off -> finite smaller
        perfect = dict(
            images_render=gt, masks_render=mask, depths_render=None
        )
        r1 = eval_batch(fd, perfect)
        assert r1["psnr"] > 60
        noisy = dict(
            images_render=jnp.clip(gt + 0.1, 0, 1),
            masks_render=mask,
            depths_render=None,
        )
        r2 = eval_batch(fd, noisy)
        assert r2["psnr"] < r1["psnr"]
        assert abs(r2["rgb_l1"] - 0.1) < 1e-3
        assert "psnr_fg" in r2 and np.isfinite(r2["psnr_fg"])


class TestSceneBatchSampler:
    def _dataset(self):
        from pytorch3d_tpu.implicitron.dataset.sql_dataset import (
            SqlIndexDataset,
        )

        class _DS:
            def sequence_names(self):
                return ["a", "b"]

            def sequence_indices_in_order(self, seq):
                base = 0 if seq == "a" else 10
                return iter(range(base, base + 6))

        return _DS()

    def test_same_sequence_batches(self):
        from pytorch3d_tpu.implicitron.dataset.data_loader_map_provider import (
            SceneBatchSampler,
        )

        s = SceneBatchSampler(batch_size=3, num_batches=20, seed=1)
        batches = s.sample_batches(self._dataset())
        assert len(batches) == 20
        for b in batches:
            assert len(b) == 3
            # all indices from one sequence (same decade)
            assert len({i // 10 for i in b}) == 1
            assert len(set(b)) == 3  # no replacement

    def test_consecutive_frames(self):
        from pytorch3d_tpu.implicitron.dataset.data_loader_map_provider import (
            SceneBatchSampler,
        )

        s = SceneBatchSampler(
            batch_size=3, num_batches=10, sample_consecutive_frames=True, seed=2
        )
        for b in s.sample_batches(self._dataset()):
            assert b == list(range(b[0], b[0] + 3))


class TestOverfitModel:
    def test_training_forward(self):
        from pytorch3d_tpu.implicitron.models.overfit_model import OverfitModel

        model = OverfitModel(
            render_image_width=16, render_image_height=16,
            chunk_size_grid=64,
            raysampler_args=dict(
                n_pts_per_ray_training=8, n_pts_per_ray_evaluation=8,
                n_rays_per_image_sampled_from_mask=32, scene_extent=3.0,
            ),
            renderer_args=dict(
                n_pts_per_ray_fine_training=8, n_pts_per_ray_fine_evaluation=8
            ),
            implicit_function_args=dict(
                n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
                n_layers_xyz=2, append_xyz=(1,),
            ),
        )
        assert model.num_passes == 2  # pinned default
        R, T = look_at_view_transform(dist=2.7, elev=10.0, azim=30.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        img = jnp.ones((1, 16, 16, 3)) * 0.6
        fg = jnp.ones((1, 16, 16, 1))
        from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode

        params = model.init(
            jax.random.PRNGKey(0), image_rgb=img, camera=cams,
            fg_probability=fg, evaluation_mode=EvaluationMode.TRAINING,
        )
        preds = model.apply(
            params, image_rgb=img, camera=cams, fg_probability=fg,
            evaluation_mode=EvaluationMode.TRAINING,
        )
        assert np.isfinite(float(preds["objective"]))
        assert "loss_prev_stage_rgb_mse" in preds


class TestModelDBIR:
    def test_reprojection_roundtrip(self):
        """Constant-depth plane re-rendered into the SAME camera must
        reproduce the source image (splats land on their source pixels)."""
        from pytorch3d_tpu.implicitron.models.overfit_model import ModelDBIR

        H = W = 48
        R, T = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        ys, xs = jnp.meshgrid(
            jnp.linspace(0, 1, H), jnp.linspace(0, 1, W), indexing="ij"
        )
        img = jnp.stack([xs, ys, 0.5 * jnp.ones_like(xs)], -1)[None]
        depth = jnp.full((1, H, W, 1), 2.0)
        model = ModelDBIR(render_image_width=W, render_image_height=H)
        out = model.apply({}, camera=cams, image_rgb=img, depth_map=depth)
        ren = np.asarray(out["images_render"])[0]
        assert ren.shape[:2] == (H, W)
        src = np.asarray(img[0])
        # compare away from borders (splat falloff at edges)
        diff = np.abs(ren[8:-8, 8:-8, :3] - src[8:-8, 8:-8])
        assert diff.mean() < 0.08


class TestImplicitronEvaluator:
    def test_run_over_loader(self, tmp_path):
        import json

        from pytorch3d_tpu.implicitron.dataset.data_loader_map_provider import (
            SequenceDataLoaderMapProvider,
        )
        from pytorch3d_tpu.implicitron.dataset.rendered_mesh_dataset_map_provider import (
            RenderedMeshDatasetMapProvider,
        )
        from pytorch3d_tpu.implicitron.evaluation.evaluator import (
            ImplicitronEvaluator,
        )
        from pytorch3d_tpu.implicitron.models.generic_model import GenericModel
        from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode

        provider = RenderedMeshDatasetMapProvider(num_views=4, resolution=16)
        dsmap = provider.get_dataset_map()
        loaders = SequenceDataLoaderMapProvider().get_data_loader_map(dsmap)
        test_loader = loaders["val"] or loaders["test"]

        model = GenericModel(
            render_image_width=16, render_image_height=16, num_passes=1,
            chunk_size_grid=64,
            raysampler_args=dict(
                n_pts_per_ray_training=4, n_pts_per_ray_evaluation=4,
                n_rays_per_image_sampled_from_mask=16, scene_extent=3.0,
            ),
            implicit_function_args=dict(
                n_hidden_neurons_xyz=8, n_hidden_neurons_dir=4,
                n_layers_xyz=2, append_xyz=(1,),
            ),
        )
        frame0 = next(iter(test_loader))
        params = model.init(
            jax.random.PRNGKey(0), image_rgb=frame0.image_rgb,
            camera=frame0.camera, fg_probability=frame0.fg_probability,
            evaluation_mode=EvaluationMode.TRAINING,
        )
        ev = ImplicitronEvaluator()
        results = ev.run(
            model, params, test_loader,
            exp_dir=str(tmp_path), dump_to_json=True,
        )
        assert len(results) == len(test_loader)
        for r in results:
            assert np.isfinite(r["psnr"])
        dumped = json.load(open(tmp_path / "results_test.json"))
        assert "aggregate" in dumped and len(dumped["results"]) == len(results)


class TestTransformerTrunk:
    def test_permutation_equivariance(self):
        """Self-attention over ray points with no positional encoding must
        be permutation-equivariant along the point axis."""
        from pytorch3d_tpu.implicitron.models.implicit_function.decoding_functions import (
            TransformerWithInputSkips,
        )

        trunk = TransformerWithInputSkips(
            n_layers=2, output_dim=16, skip_dim=12, hidden_dim=16,
            input_skips=(1,),
        )
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 3, 7, 12))  # (B, rays, pts, C)
        params = trunk.init(key, x, x)
        y = trunk.apply(params, x, x)
        assert y.shape == (2, 3, 7, 16)
        perm = jnp.asarray([3, 0, 6, 1, 5, 2, 4])
        y_perm = trunk.apply(params, x[:, :, perm], x[:, :, perm])
        assert np.allclose(np.asarray(y[:, :, perm]), np.asarray(y_perm), atol=1e-5)

    def test_points_interact(self):
        """Unlike the MLP trunk, changing one point's input must change the
        other points' outputs (attention mixes the point axis)."""
        from pytorch3d_tpu.implicitron.models.implicit_function.decoding_functions import (
            TransformerWithInputSkips,
        )

        trunk = TransformerWithInputSkips(
            n_layers=1, output_dim=8, skip_dim=6, hidden_dim=8, input_skips=()
        )
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (1, 1, 5, 6))
        params = trunk.init(key, x, x)
        y0 = trunk.apply(params, x, x)
        x2 = x.at[0, 0, 0].add(1.0)
        y1 = trunk.apply(params, x2, x2)
        # output at point 3 changed although only point 0's input changed
        assert not np.allclose(np.asarray(y0[0, 0, 3]), np.asarray(y1[0, 0, 3]))

    def test_dual_axis_pool_attention(self):
        """Reference NeRFormer trunk (decoding_functions.py:302): attention
        across the un-aggregated source-view axis with final softmax
        pooling -> output is view-permutation INVARIANT but depends on
        every view's features."""
        from pytorch3d_tpu.implicitron.models.implicit_function.decoding_functions import (
            TransformerWithInputSkips,
        )

        trunk = TransformerWithInputSkips(
            n_layers=2, output_dim=16, skip_dim=12, hidden_dim=16,
            input_skips=(1,), dim_down_factor=2.0,
        )
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (3, 2, 5, 7, 12))  # (V, B, rays, pts, C)
        params = trunk.init(key, x, x, pool_axis=True)
        y = trunk.apply(params, x, x, pool_axis=True)
        assert y.shape == (2, 5, 7, 16)
        x2 = x.at[2].add(1.0)
        y2 = trunk.apply(params, x2, x2, pool_axis=True)
        assert not np.allclose(np.asarray(y), np.asarray(y2))
        perm = jnp.asarray([1, 2, 0])
        y3 = trunk.apply(params, x[perm], x[perm], pool_axis=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y3), atol=1e-5
        )

    def test_angle_weighted_identity_aggregator(self):
        """AngleWeightedIdentityFeatureAggregator (reference
        feature_aggregator.py:350): per-view features weighted by ray-angle
        agreement; dim = feats_dim * n_views."""
        from pytorch3d_tpu.implicitron.models.view_pooler.feature_aggregator import (
            AngleWeightedIdentityFeatureAggregator,
        )
        from pytorch3d_tpu.renderer import FoVPerspectiveCameras, look_at_view_transform

        agg = AngleWeightedIdentityFeatureAggregator()
        assert agg.get_aggregated_feature_dim(8, 3) == 24
        R, T = look_at_view_transform(
            dist=2.7, elev=jnp.asarray([0.0, 10.0, 20.0]),
            azim=jnp.asarray([0.0, 40.0, 80.0]),
        )
        cams = FoVPerspectiveCameras.create(R=R, T=T)
        feats = {"f": jax.random.normal(jax.random.PRNGKey(0), (3, 11, 8))}
        masks = jnp.ones((3, 11, 1))
        pts = jax.random.normal(jax.random.PRNGKey(1), (1, 11, 3))
        out = agg(feats, masks, camera=cams, pts=pts)
        assert out["f"].shape == (1, 11, 24)
        assert np.isfinite(np.asarray(out["f"])).all()


class TestImplicitronDataSource:
    def test_json_provider_with_subset_lists(self, tmp_path):
        import gzip
        import json

        from pytorch3d_tpu.implicitron.dataset.data_source import (
            ImplicitronDataSource,
        )

        frames = [
            dict(sequence_name="s1", frame_number=i, image=dict(path=f"{i}.png"))
            for i in range(6)
        ]
        fa = str(tmp_path / "fa.jgz")
        with gzip.open(fa, "wt", encoding="utf8") as f:
            json.dump(frames, f)
        subsets = str(tmp_path / "subsets.json")
        with open(subsets, "w") as f:
            json.dump(
                {
                    "train": [["s1", i, ""] for i in (0, 1, 2, 3)],
                    "val": [["s1", 4, ""]],
                    "test": [["s1", 5, ""]],
                },
                f,
            )
        src = ImplicitronDataSource(
            dataset_map_provider_class_type="JsonIndexDatasetMapProvider",
            dataset_map_provider_args=dict(
                frame_annotations_file=fa,
                subset_lists_file=subsets,
                load_images=False,
            ),
        )
        dsmap, loaders = src.get_datasets_and_dataloaders()
        assert len(dsmap.train) == 4
        assert len(dsmap.val) == 1
        assert len(dsmap.test) == 1
        # loaders iterate FrameData batches
        batch = next(iter(loaders["val"]))
        assert batch.sequence_name[0] == "s1"

    def test_rendered_mesh_provider_default(self):
        from pytorch3d_tpu.implicitron.dataset.data_source import (
            ImplicitronDataSource,
        )

        src = ImplicitronDataSource(
            dataset_map_provider_args=dict(num_views=4, resolution=16)
        )
        dsmap, loaders = src.get_datasets_and_dataloaders()
        assert len(dsmap.train) >= 3
        b = next(iter(loaders["train"]))
        assert b.image_rgb.shape[-1] == 3


class TestRenderFlyaround:
    def test_writes_video(self, tmp_path):
        from pytorch3d_tpu.implicitron.dataset.rendered_mesh_dataset_map_provider import (
            RenderedMeshDatasetMapProvider,
        )
        from pytorch3d_tpu.implicitron.models.generic_model import GenericModel
        from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode
        from pytorch3d_tpu.implicitron.models.visualization.render_flyaround import (
            render_flyaround,
        )

        provider = RenderedMeshDatasetMapProvider(num_views=6, resolution=16)
        train = provider.get_dataset_map()["train"]
        model = GenericModel(
            render_image_width=8, render_image_height=8, num_passes=1,
            chunk_size_grid=32,
            raysampler_args=dict(
                n_pts_per_ray_training=4, n_pts_per_ray_evaluation=4,
                n_rays_per_image_sampled_from_mask=8, scene_extent=3.0,
            ),
            implicit_function_args=dict(
                n_hidden_neurons_xyz=8, n_hidden_neurons_dir=4,
                n_layers_xyz=2, append_xyz=(1,),
            ),
        )
        f0 = train[0]
        params = model.init(
            jax.random.PRNGKey(0), image_rgb=f0.image_rgb, camera=f0.camera,
            fg_probability=f0.fg_probability,
            evaluation_mode=EvaluationMode.TRAINING,
        )

        class _DS:
            def __len__(self):
                return len(train)

            def __getitem__(self, i):
                return train[i]

        out = str(tmp_path / "fly.gif")
        path = render_flyaround(
            _DS(), None, model, params, out, n_flyaround_poses=3, fps=2
        )
        import os as _os

        assert _os.path.isfile(path) and _os.path.getsize(path) > 0


class TestPrefetchingLoader:
    def test_threaded_prefetch_matches_sync_order(self):
        from pytorch3d_tpu.implicitron.dataset.data_loader_map_provider import (
            _Loader,
        )
        from pytorch3d_tpu.implicitron.dataset.rendered_mesh_dataset_map_provider import (
            RenderedMeshDatasetMapProvider,
        )

        provider = RenderedMeshDatasetMapProvider(num_views=6, resolution=8)
        dsmap = provider.get_dataset_map()
        ds = dsmap["train"] if isinstance(dsmap, dict) else dsmap.train
        n = len(ds)
        assert n >= 3
        batches = [[0, 1], [2, 0], [1, 2], [0, 2]]
        sync = list(_Loader(ds, batches))
        pre = list(_Loader(ds, batches, num_workers=3))
        assert len(sync) == len(pre) == 4
        for a, b in zip(sync, pre):
            np.testing.assert_allclose(
                np.asarray(a.image_rgb), np.asarray(b.image_rgb)
            )
            assert list(a.frame_number) == list(b.frame_number)
