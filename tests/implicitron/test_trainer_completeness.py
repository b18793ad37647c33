"""Trainer completeness: per-module param groups, warmup, repro config
family, Stats plots (reference impl/optimizer_factory.py:255,
configs/repro_*.yaml, tools/stats.py:340)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..")
)
from projects.implicitron_trainer.experiment import (  # noqa: E402
    Experiment,
    ImplicitronOptimizerFactory,
    load_config,
)

CONFIGS = os.path.join(
    os.path.dirname(__file__), "..", "..", "projects",
    "implicitron_trainer", "configs",
)


class TestParamGroups:
    def _params(self):
        return {
            "params": {
                "implicit_function_0": {"dense": jnp.ones((4, 4))},
                "global_encoder": {"embed": jnp.ones((8,))},
                "feature_extractor": {"conv": jnp.ones((3, 3))},
            }
        }

    def test_labels_longest_match(self):
        fac = ImplicitronOptimizerFactory(
            param_groups={
                "global_encoder": "codes",
                "global_encoder/embed": "embeds",
            },
            group_learning_rates={"codes": 0.1, "embeds": 10.0},
        )
        labels = fac.param_group_labels(self._params())
        assert labels["params"]["global_encoder"]["embed"] == "embeds"
        assert labels["params"]["implicit_function_0"]["dense"] == "default"

    def test_per_group_lr_scaling(self):
        fac = ImplicitronOptimizerFactory(
            lr=1.0,
            lr_policy="MultiStepLR",
            milestones=(),
            param_groups={"global_encoder": "codes"},
            group_learning_rates={"codes": 0.0},  # frozen group
        )
        params = self._params()
        opt = fac(10, 1, params=params)
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        # frozen group gets zero updates; default group moves
        assert float(
            jnp.abs(updates["params"]["global_encoder"]["embed"]).max()
        ) == 0.0
        assert float(
            jnp.abs(
                updates["params"]["implicit_function_0"]["dense"]
            ).max()
        ) > 0.0

    def test_warmup(self):
        fac = ImplicitronOptimizerFactory(
            lr=1.0, milestones=(), warmup_steps=10
        )
        params = {"w": jnp.ones((2,))}
        opt = fac(10, 1)
        state = opt.init(params)
        grads = {"w": jnp.ones((2,))}
        u0, state = opt.update(grads, state, params)
        for _ in range(20):
            u, state = opt.update(grads, state, params)
        # step 0 update is ~0 (warmup), later steps are full-size
        assert float(jnp.abs(u0["w"]).max()) < 1e-6
        assert float(jnp.abs(u["w"]).max()) > 0.1


class TestReproConfigs:
    def test_all_configs_load_and_construct(self):
        n = 0
        for f in sorted(os.listdir(CONFIGS)):
            if not f.endswith(".yaml"):
                continue
            cfg = load_config(os.path.join(CONFIGS, f))
            # data-source configs reference CO3D env roots; constructing
            # the Experiment object (without run()) must always work
            exp = Experiment(**cfg)
            assert exp.optimizer_factory is not None
            n += 1
        assert n >= 40

    def test_repro_family_presence(self):
        names = set(os.listdir(CONFIGS))
        for required in [
            "repro_base.yaml",
            "repro_singleseq_nerf.yaml",
            "repro_singleseq_nerformer.yaml",
            "repro_singleseq_srn.yaml",
            "repro_singleseq_idr.yaml",
            "repro_multiseq_nerformer.yaml",
            "repro_multiseq_nerf_wce.yaml",
            "repro_multiseq_srn_ad_hypernet.yaml",
        ]:
            assert required in names, required

    def test_base_chaining(self):
        cfg = load_config(
            os.path.join(CONFIGS, "repro_singleseq_nerformer.yaml")
        )
        m = cfg["model_args"]
        # leaf overrides
        assert m["implicit_function_class_type"] == "NeRFormerImplicitFunction"
        assert m["chunk_size_grid"] == 16000
        # inherited from repro_base
        assert m["render_image_height"] == 400
        assert cfg["optimizer_factory_args"]["lr"] == 0.0005


class TestStatsPlot:
    def test_plot_file_written(self, tmp_path):
        from pytorch3d_tpu.implicitron.tools.stats import Stats

        s = Stats(log_vars=["objective", "loss_rgb_mse"])
        for e in range(3):
            s.new_epoch()
            for i in range(4):
                s.update(
                    {"objective": 1.0 / (e + 1), "loss_rgb_mse": 0.1 * e}
                )
                s.update({"objective": 2.0 / (e + 1)}, stat_set="val")
        out = str(tmp_path / "train_stats.png")
        s.plot_stats(plot_file=out)
        assert os.path.getsize(out) > 1000


class TestModelFactory:
    def test_builds_registered_model(self):
        from projects.implicitron_trainer.experiment import (
            ImplicitronModelFactory,
        )
        from pytorch3d_tpu.implicitron.models.generic_model import (
            GenericModel,
        )
        from pytorch3d_tpu.implicitron.models.overfit_model import ModelDBIR

        fac = ImplicitronModelFactory(
            model_args={"render_image_width": 8, "render_image_height": 8}
        )
        m = fac("")
        assert isinstance(m, GenericModel) and m.render_image_width == 8
        fac2 = ImplicitronModelFactory(model_class_type="ModelDBIR")
        assert isinstance(fac2(""), ModelDBIR)

    def test_checkpoint_selection(self, tmp_path):
        from projects.implicitron_trainer.experiment import (
            ImplicitronModelFactory,
        )
        from pytorch3d_tpu.implicitron.tools import model_io

        fac = ImplicitronModelFactory(resume=True)
        assert fac.checkpoint_path(str(tmp_path)) is None
        with np.testing.assert_raises(FileNotFoundError):
            ImplicitronModelFactory(
                resume=True, force_resume=True
            ).checkpoint_path(str(tmp_path))
        # write a checkpoint and select it by epoch
        model_io.safe_save_model({"w": jnp.ones(2)}, None, None,
                                 str(tmp_path), 3)
        assert fac.checkpoint_path(str(tmp_path)) is not None
        by_epoch = ImplicitronModelFactory(
            resume=True, resume_epoch=3
        ).checkpoint_path(str(tmp_path))
        assert by_epoch and by_epoch.endswith("model_epoch_00000003")
