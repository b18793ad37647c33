"""Checkpoint save/load.

Parity: reference implicitron/tools/model_io.py (`safe_save_model` :56,
`get_checkpoint` :130, `find_last_checkpoint` :135, purge :96).

TPU-native: parameters / optimizer state are JAX pytrees checkpointed with
orbax (sharded-array aware, the torch.save equivalent); stats go to JSON.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import Any, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def get_checkpoint(exp_dir: str, epoch: int) -> str:
    """Epoch-stamped checkpoint path matching safe_save_model's naming
    (reference model_io.py:130 builds model_epoch_%08d the same way)."""
    return os.path.join(exp_dir, "model_epoch_%08d" % epoch)


def find_last_checkpoint(
    exp_dir: str, any_path: bool = False, all_checkpoints: bool = False
):
    """Most recent model checkpoint in exp_dir (reference :135)."""
    fls = sorted(
        glob.glob(
            os.path.join(glob.escape(exp_dir), "model_epoch_" + "[0-9]" * 8)
        )
    )
    if len(fls) == 0:
        return None
    if all_checkpoints:
        return fls
    return fls[-1]


def parse_epoch_from_model_path(model_path: str) -> int:
    return int(re.findall(r"\d{8}", model_path)[-1])


def safe_save_model(
    params: Any,
    opt_state: Any,
    stats,
    exp_dir: str,
    epoch: int,
) -> str:
    """Atomically save (params, opt_state) + stats (reference :56)."""
    os.makedirs(exp_dir, exist_ok=True)
    path = os.path.join(exp_dir, "model_epoch_%08d" % epoch)
    tmp = path + "_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    ckpt = _checkpointer()
    ckpt.save(
        os.path.abspath(tmp), {"params": params, "opt_state": opt_state}
    )
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    if stats is not None:
        # MUST go through get_stats_path: an ad-hoc "_stats.json" suffix
        # here silently broke stats resume (loaders look up the
        # get_stats_path name; found by test_experiment_roundtrip)
        stats.save(get_stats_path(path))
    return path


def load_model(path: str, like: Optional[Any] = None) -> Tuple[Any, Any, Optional[Any]]:
    """Load (params, opt_state, stats) saved by safe_save_model.

    `like`: optional {"params": ..., "opt_state": ...} template pytree —
    required to restore custom container types (e.g. optax states), since
    a bare restore yields nested dicts.
    """
    ckpt = _checkpointer()
    if like is not None:
        import jax

        template = jax.tree_util.tree_map(lambda x: x, like)
        data = ckpt.restore(os.path.abspath(path), item=template)
    else:
        data = ckpt.restore(os.path.abspath(path))
    stats = None
    stats_path = get_stats_path(path)
    if os.path.isfile(stats_path):
        from .stats import Stats

        stats = Stats.load(stats_path)
    return data["params"], data["opt_state"], stats


def purge_epoch(exp_dir: str, epoch: int) -> None:
    path = os.path.join(exp_dir, "model_epoch_%08d" % epoch)
    if os.path.isdir(path):
        shutil.rmtree(path)
    for f in (get_stats_path(path), path + "_stats.json"):
        if os.path.isfile(f):
            os.remove(f)


def get_model_path(fl) -> str:
    """model file path for a checkpoint stem (reference model_io.py:31;
    orbax checkpoints are directories, so the stem itself)."""
    return os.path.splitext(str(fl))[0]


def get_optimizer_path(fl) -> str:
    """optimizer path for a checkpoint stem (reference :37)."""
    return "%s_opt" % os.path.splitext(str(fl))[0]


def get_stats_path(fl, eval_results: bool = False) -> str:
    """stats (jgz) path for a checkpoint stem (reference :43)."""
    fl = os.path.splitext(str(fl))[0]
    if eval_results:
        for postfix in ("_2", ""):
            flstats = os.path.join(
                os.path.dirname(fl), f"stats_test{postfix}.jgz"
            )
            if os.path.isfile(flstats):
                return flstats
        return flstats
    return "%s_stats.jgz" % fl


def save_stats(stats, fl, cfg=None) -> str:
    """Save a Stats object next to a checkpoint stem (reference :103)."""
    flstats = get_stats_path(fl)
    stats.save(flstats)
    return flstats


def load_stats(flstats):
    """Load a Stats object, or None if absent (reference :22)."""
    from .stats import Stats

    if not os.path.isfile(flstats):
        return None
    return Stats.load(flstats)


def save_model(params, stats, fl, opt_state=None, cfg=None):
    """Save params (+ optional optimizer state) and stats under a
    checkpoint stem (reference :87). Returns (flstats, flmodel)."""
    flstats = get_stats_path(fl)
    flmodel = get_model_path(fl)
    ckpt = _checkpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckpt.save(os.path.abspath(flmodel), payload, force=True)
    if stats is not None:
        stats.save(flstats)
    return flstats, flmodel
