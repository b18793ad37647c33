"""Implicitron training entry point.

Parity: reference projects/implicitron_trainer/experiment.py:99
(`Experiment` Configurable: data_source / model_factory / optimizer_factory
/ training_loop), impl/training_loop.py:68 (`ImplicitronTrainingLoop`),
impl/optimizer_factory.py:48 (`ImplicitronOptimizerFactory`).

TPU-native: the Accelerate/DDP multi-GPU wrapping (reference
experiment.py:158-212, training_loop.py:415) is replaced by a
jax.sharding.Mesh over ("dp", "rays") with a jitted sharded train step —
gradient all-reduce is an XLA psum over ICI, checkpointing is orbax
(implicitron/tools/model_io.py).

Run:  python projects/implicitron_trainer/experiment.py  (smoke config)
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch3d_tpu.implicitron.dataset.frame_data import FrameData
from pytorch3d_tpu.implicitron.dataset.rendered_mesh_dataset_map_provider import (
    RenderedMeshDatasetMapProvider,
)
from pytorch3d_tpu.implicitron.models.generic_model import GenericModel
from pytorch3d_tpu.implicitron.models.renderer.base import EvaluationMode
from pytorch3d_tpu.implicitron.tools import model_io
from pytorch3d_tpu.implicitron.tools.config import (
    Configurable,
    get_default_args,
    run_auto_creation,
)
from pytorch3d_tpu.implicitron.tools.stats import Stats


@dataclasses.dataclass
class ImplicitronOptimizerFactory(Configurable):
    """Optimizer construction (reference impl/optimizer_factory.py:48)."""

    breed: str = "Adam"
    lr: float = 5e-4
    weight_decay: float = 0.0
    lr_policy: str = "MultiStepLR"
    gamma: float = 0.1
    momentum: float = 0.9
    betas: tuple = (0.9, 0.999)
    milestones: tuple = (200, 300)
    exponential_lr_step_size: int = 250
    linear_exponential_lr_milestone: int = 200
    linear_exponential_start_gamma: float = 0.1
    # linear warmup prepended to any policy (0 = off)
    warmup_steps: int = 0
    # Per-module parameter groups (reference optimizer_factory.py:255):
    # `param_groups` maps a parameter-path SUBSTRING (of the
    # '/'-joined flax param path) to a group name; the longest matching
    # pattern wins, unmatched parameters go to "default".
    # `group_learning_rates` maps group names to LR multipliers applied
    # on top of the base schedule (reference _get_group_learning_rate).
    param_groups: Optional[Dict[str, str]] = None
    group_learning_rates: Optional[Dict[str, float]] = None

    def param_group_labels(self, params):
        """Label pytree for optax.multi_transform: each parameter gets its
        group name by longest-substring match of its '/'-joined path."""
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def label_of(path):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            best, best_len = "default", -1
            for pat, group in (self.param_groups or {}).items():
                if pat in name and len(pat) > best_len:
                    best, best_len = group, len(pat)
            return best

        labels = [label_of(p) for p, _ in flat]
        treedef = jax.tree_util.tree_structure(params)
        return jax.tree_util.tree_unflatten(treedef, labels)

    def __call__(self, total_epochs: int, iters_per_epoch: int = 1,
                 params=None):
        if self.lr_policy == "MultiStepLR":
            boundaries = {
                m * iters_per_epoch: self.gamma for m in self.milestones
            }
            schedule = optax.piecewise_constant_schedule(self.lr, boundaries)
        elif self.lr_policy == "Exponential":
            schedule = optax.exponential_decay(
                self.lr,
                self.exponential_lr_step_size * iters_per_epoch,
                self.gamma,
            )
        elif self.lr_policy == "LinearExponential":
            warm = self.linear_exponential_lr_milestone * iters_per_epoch
            schedule = optax.join_schedules(
                [
                    optax.linear_schedule(
                        self.lr * self.linear_exponential_start_gamma,
                        self.lr,
                        warm,
                    ),
                    optax.exponential_decay(
                        self.lr,
                        self.exponential_lr_step_size * iters_per_epoch,
                        self.gamma,
                    ),
                ],
                [warm],
            )
        else:
            raise ValueError(f"Unknown lr policy {self.lr_policy}")

        if self.warmup_steps > 0:
            base = schedule
            warmup = optax.linear_schedule(0.0, 1.0, self.warmup_steps)

            def schedule(step, _base=base, _w=warmup):  # noqa: F811
                return _base(step) * _w(step)

        def build(scale: float = 1.0):
            sched = (
                schedule
                if scale == 1.0
                else (lambda s, _sc=scale: schedule(s) * _sc)
            )
            if self.breed == "Adam":
                opt = optax.adam(
                    sched, b1=self.betas[0], b2=self.betas[1]
                )
            elif self.breed == "AdamW":
                opt = optax.adamw(sched, weight_decay=self.weight_decay)
            elif self.breed == "SGD":
                opt = optax.sgd(sched, momentum=self.momentum)
            else:
                raise ValueError(f"Unknown optimizer breed {self.breed}")
            if self.weight_decay > 0 and self.breed != "AdamW":
                opt = optax.chain(
                    optax.add_decayed_weights(self.weight_decay), opt
                )
            return opt

        if not self.param_groups or params is None:
            return build()

        groups = {"default"} | set(self.param_groups.values())
        glr = self.group_learning_rates or {}
        transforms = {g: build(glr.get(g, 1.0)) for g in groups}
        labels = self.param_group_labels(params)
        return optax.multi_transform(transforms, labels)


def seed_all_random_engines(seed: int) -> None:
    """Seed python/numpy RNGs (reference impl/utils.py:16; JAX randomness
    is explicit-key based, so the seed feeds PRNGKey construction)."""
    import random

    np.random.seed(seed)
    random.seed(seed)


class TrainingLoopBase(Configurable):
    """Replaceable training-loop base (reference impl/training_loop.py:33)."""

    def run(self, **kwargs):
        raise NotImplementedError

    @staticmethod
    def load_stats(log_vars, exp_dir, resume: bool = True, **kwargs):
        """Load (or create) the Stats for an experiment dir (reference
        training_loop.py:56/:233)."""
        if resume and exp_dir:
            last = model_io.find_last_checkpoint(exp_dir)
            if last is not None:
                stats_path = model_io.get_stats_path(last)
                loaded = model_io.load_stats(stats_path)
                if loaded is not None:
                    return loaded
        return Stats(log_vars=list(log_vars))


@dataclasses.dataclass
class ImplicitronTrainingLoop(TrainingLoopBase):
    """Epoch loop with checkpointing (reference impl/training_loop.py:68)."""

    max_epochs: int = 10
    store_checkpoints: bool = True
    store_checkpoints_purge: int = 1
    test_interval: int = -1
    validation_interval: int = 1
    clip_grad: float = 0.0
    seed: int = 0

    def run(
        self,
        *,
        model: GenericModel,
        params,
        optimizer,
        opt_state,
        datasets: Dict[str, list],
        stats: Stats,
        exp_dir: str,
        start_epoch: int = 0,
    ):
        # `params` is the full flax variables dict; only the "params"
        # collection is trained — auxiliary collections (e.g. voxel-grid
        # scaffolds/extents in "buffers") ride along untouched by the
        # optimizer and are updated by epoch callbacks below.
        variables = params
        if "params" in variables:
            train_params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}
        else:  # legacy: a bare params tree
            train_params, aux = variables, {}

        @jax.jit
        def train_step(params, aux, opt_state, image_rgb, camera, fg, key):
            def loss_fn(p):
                preds = model.apply(
                    {"params": p, **aux},
                    image_rgb=image_rgb,
                    camera=camera,
                    fg_probability=fg,
                    evaluation_mode=EvaluationMode.TRAINING,
                    key=key,
                )
                return preds["objective"], preds

            (loss, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            if self.clip_grad > 0:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, self.clip_grad / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, preds

        epoch_subs = (
            model.epoch_subscriptions()
            if hasattr(model, "epoch_subscriptions")
            else ()
        )

        @jax.jit
        def val_step(params, aux, image_rgb, camera, fg, key):
            # MC-ray validation metrics (no gradient); full-image renders
            # are the evaluator's job
            return model.apply(
                {"params": params, **aux},
                image_rgb=image_rgb,
                camera=camera,
                fg_probability=fg,
                evaluation_mode=EvaluationMode.TRAINING,
                key=key,
            )

        key = jax.random.PRNGKey(self.seed)
        for epoch in range(start_epoch, self.max_epochs):
            # scheduled module updates (voxel grid resolution changes,
            # scaffold computation, volume cropping); a parameter-shape
            # change invalidates optimizer state, so rebuild it
            # (reference impl/training_loop.py re-creates the optimizer
            # when a subscribed callback reports a change)
            if epoch in epoch_subs:
                new_vars, changed = model.apply_epoch_callbacks(
                    {"params": train_params, **aux}, epoch
                )
                train_params = new_vars["params"]
                aux = {k: v for k, v in new_vars.items() if k != "params"}
                if changed:
                    opt_state = optimizer.init(train_params)
            stats.new_epoch()
            # deterministic per-epoch shuffling (reference :166 reseeding)
            order = np.random.RandomState(self.seed + epoch).permutation(
                len(datasets["train"])
            )
            for i in order:
                frame = datasets["train"][int(i)]
                key, sub = jax.random.split(key)
                train_params, opt_state, loss, preds = train_step(
                    train_params,
                    aux,
                    opt_state,
                    frame.image_rgb,
                    frame.camera,
                    frame.fg_probability,
                    sub,
                )
                if not bool(jnp.isfinite(loss)):
                    raise ValueError("Non-finite loss!")
                preds = dict(preds, objective=loss)
                stats.update(
                    {
                        k: v
                        for k, v in preds.items()
                        if isinstance(v, jnp.ndarray) and v.ndim == 0
                    },
                    stat_set="train",
                )
            stats.print(stat_set="train")

            # validation epoch (reference training_loop.py:117 runs the
            # val loader every `validation_interval` epochs)
            try:
                val_set = datasets["val"]
            except (KeyError, TypeError, IndexError):
                val_set = getattr(datasets, "val", None)
            if (
                val_set is not None
                and len(val_set) > 0
                and self.validation_interval > 0
                and epoch % self.validation_interval == 0
            ):
                for frame in val_set:
                    key, sub = jax.random.split(key)
                    preds = val_step(
                        train_params,
                        aux,
                        frame.image_rgb,
                        frame.camera,
                        frame.fg_probability,
                        sub,
                    )
                    stats.update(
                        {
                            k: v
                            for k, v in preds.items()
                            if isinstance(v, jnp.ndarray) and v.ndim == 0
                        },
                        stat_set="val",
                    )
                stats.print(stat_set="val")

            if self.store_checkpoints and exp_dir:
                model_io.safe_save_model(
                    {"params": train_params, **aux},
                    opt_state,
                    stats,
                    exp_dir,
                    epoch,
                )
                purge = epoch - self.store_checkpoints_purge
                if self.store_checkpoints_purge > 0 and purge >= 0:
                    model_io.purge_epoch(exp_dir, purge)
        return {"params": train_params, **aux}, opt_state



@dataclasses.dataclass
class ImplicitronModelFactory(Configurable):
    """Builds the implicitron model and optionally resumes its weights
    (reference impl/model_factory.py:46 `ImplicitronModelFactory`).

    __call__(exp_dir) returns the (un-initialized) flax model; use
    `load_checkpoint(exp_dir, like)` to restore variables.
    """

    model_class_type: str = "GenericModel"
    model_args: Optional[Dict[str, Any]] = None
    resume: bool = True
    resume_epoch: int = -1
    force_resume: bool = False

    def __call__(self, exp_dir: str = ""):
        from pytorch3d_tpu.implicitron.models.base_model import (
            ImplicitronModelBase,
        )
        from pytorch3d_tpu.implicitron.tools.config import registry

        cls = registry.get(ImplicitronModelBase, self.model_class_type)
        return cls(**(self.model_args or {}))

    def checkpoint_path(self, exp_dir: str) -> Optional[str]:
        """The checkpoint selected by resume/resume_epoch (reference
        model_factory.py:81 region); None if not resuming / absent."""
        if not (self.resume and exp_dir):
            return None
        if self.resume_epoch > 0:
            path = model_io.get_checkpoint(exp_dir, self.resume_epoch)
            if not os.path.exists(path):
                if self.force_resume:
                    raise FileNotFoundError(
                        f"Cannot find checkpoint {path} (force_resume)."
                    )
                return None
            return path
        last = model_io.find_last_checkpoint(exp_dir)
        if last is None and self.force_resume:
            raise FileNotFoundError(
                f"Cannot find any checkpoint in {exp_dir} (force_resume)."
            )
        return last


@dataclasses.dataclass
class Experiment(Configurable):
    """Top-level experiment (reference experiment.py:99)."""

    exp_dir: str = "./exp"
    resume: bool = True
    model_args: Optional[Dict[str, Any]] = None
    dataset_args: Optional[Dict[str, Any]] = None
    # full data-source selection (provider class + args), the analog of
    # the reference's data_source_ImplicitronDataSource_args; when set it
    # overrides dataset_args
    data_source_args: Optional[Dict[str, Any]] = None
    # optional explicit model factory (reference model_factory.py); when
    # set, overrides model_args/resume for model construction
    model_factory_args: Optional[Dict[str, Any]] = None
    optimizer_factory: ImplicitronOptimizerFactory = None
    training_loop: ImplicitronTrainingLoop = None

    def __post_init__(self):
        run_auto_creation(self)

    def _dump_config(self):
        """Write the experiment config into exp_dir (reference
        experiment.py:269 dumps expconfig.yaml) so tools like
        visualize_reconstruction can rebuild the model/dataset."""
        if not self.exp_dir:
            return
        import yaml

        os.makedirs(self.exp_dir, exist_ok=True)
        cfg = {}
        for k in (
            "exp_dir",
            "resume",
            "model_args",
            "dataset_args",
            "data_source_args",
            "optimizer_factory_args",
            "training_loop_args",
        ):
            v = getattr(self, k, None)
            if v is not None:
                cfg[k] = v

        def plain(x):
            if isinstance(x, dict):
                return {kk: plain(vv) for kk, vv in x.items()}
            if isinstance(x, (list, tuple)):
                return [plain(vv) for vv in x]
            return x

        with open(os.path.join(self.exp_dir, "expconfig.yaml"), "w") as f:
            yaml.safe_dump(plain(cfg), f, sort_keys=False)

    def run(self):
        self._dump_config()
        if self.data_source_args:
            print("[setup] building data source...", flush=True)
            from pytorch3d_tpu.implicitron.dataset.data_source import (
                ImplicitronDataSource,
            )

            source = ImplicitronDataSource(**self.data_source_args)
            datasets, _ = source.get_datasets_and_dataloaders()
        else:
            print("[setup] rendering in-process dataset...", flush=True)
            provider = RenderedMeshDatasetMapProvider(
                **(self.dataset_args or {})
            )
            datasets = provider.get_dataset_map()

        print("[setup] building + initializing model...", flush=True)
        factory = ImplicitronModelFactory(
            **(
                self.model_factory_args
                if self.model_factory_args is not None
                else {"model_args": self.model_args, "resume": self.resume}
            )
        )
        model = factory(self.exp_dir)
        frame0 = datasets["train"][0]
        key = jax.random.PRNGKey(0)
        params = model.init(
            key,
            image_rgb=frame0.image_rgb,
            camera=frame0.camera,
            fg_probability=frame0.fg_probability,
            evaluation_mode=EvaluationMode.TRAINING,
        )
        train_params = params.get("params", params)
        optimizer = self.optimizer_factory(
            self.training_loop.max_epochs, len(datasets["train"]),
            params=train_params,
        )
        opt_state = optimizer.init(train_params)

        stats = Stats(
            log_vars=["objective", "loss_rgb_mse", "loss_rgb_psnr", "sec/it"]
        )
        start_epoch = 0
        if self.resume and self.exp_dir:
            last = model_io.find_last_checkpoint(self.exp_dir)
            if last is not None:
                params, opt_state, loaded_stats = model_io.load_model(
                    last, like={"params": params, "opt_state": opt_state}
                )
                if loaded_stats is not None:
                    stats = loaded_stats
                start_epoch = model_io.parse_epoch_from_model_path(last) + 1

        return self.training_loop.run(
            model=model,
            params=params,
            optimizer=optimizer,
            opt_state=opt_state,
            datasets=datasets,
            stats=stats,
            exp_dir=self.exp_dir,
            start_epoch=start_epoch,
        )


def _deep_update(base, override):
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v


def load_config(path: str):
    """Load a YAML experiment config on top of the defaults (the Hydra
    entry of the reference, experiment.py:281)."""
    import yaml

    with open(path) as f:
        override = yaml.safe_load(f) or {}
    # `base:` chains configs (the reference's hydra `defaults:` list)
    base = override.pop("base", None)
    if base is not None:
        import os as _os

        bases = base if isinstance(base, list) else [base]
        cfg = {}
        for b in bases:
            bcfg = load_config(_os.path.join(_os.path.dirname(path), b))
            _deep_update(cfg, bcfg)
        def tuplify0(d):
            for k, v in d.items():
                if isinstance(v, list):
                    d[k] = tuple(v)
                elif isinstance(v, dict):
                    tuplify0(v)
        tuplify0(override)
        _deep_update(cfg, override)
        return cfg
    cfg = get_default_args(Experiment)
    # convert lists to tuples where dataclass defaults expect tuples
    def tuplify(d):
        for k, v in d.items():
            if isinstance(v, list):
                d[k] = tuple(v)
            elif isinstance(v, dict):
                tuplify(v)
    tuplify(override)
    _deep_update(cfg, override)
    return cfg


def main():
    import sys

    if len(sys.argv) > 1:
        if not sys.argv[1].endswith((".yaml", ".yml")):
            raise SystemExit(
                f"usage: experiment.py [config.yaml]  (got {sys.argv[1]!r}; "
                "pass the yaml path as the first positional argument)"
            )
        cfg = load_config(sys.argv[1])
        experiment = Experiment(**cfg)
        experiment.run()
        return
    cfg = get_default_args(Experiment)
    cfg["exp_dir"] = os.environ.get("EXP_DIR", "/tmp/implicitron_exp")
    cfg["model_args"] = dict(
        render_image_width=64,
        render_image_height=64,
        num_passes=2,
        chunk_size_grid=2048,
        raysampler_args=dict(
            n_pts_per_ray_training=32,
            n_pts_per_ray_evaluation=32,
            n_rays_per_image_sampled_from_mask=256,
            scene_extent=3.0,
        ),
        renderer_args=dict(
            n_pts_per_ray_fine_training=32, n_pts_per_ray_fine_evaluation=32
        ),
        implicit_function_args=dict(
            n_hidden_neurons_xyz=64, n_hidden_neurons_dir=32, n_layers_xyz=4,
            append_xyz=(2,),
        ),
    )
    cfg["dataset_args"] = dict(num_views=20, resolution=64)
    cfg["training_loop_args"]["max_epochs"] = int(
        os.environ.get("MAX_EPOCHS", 3)
    )
    experiment = Experiment(**cfg)
    experiment.run()


if __name__ == "__main__":
    main()
