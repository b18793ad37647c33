"""New-view-synthesis evaluation.

Parity: reference implicitron/evaluation/evaluate_new_view_synthesis.py
(`eval_batch` :147 — IoU, crop-masked and fg-masked PSNR / RGB-L1,
best-scale depth-abs error, full-image PSNR / RGB-L1, LPIPS, metadata;
`average_per_batch_results` :374, camera-difficulty helpers :408,
`summarize_nvs_eval_results` :419 with train/test and n-source-view
binning, `flatten_nvs_results` :499, `pretty_print_nvs_metrics` :527,
`aggregate_nvs_results` :564).

The `lpips_model` argument accepts any object with a
`forward(im1, im2)` method on (N, 3, H, W) [-1, 1] images;
`tools.lpips.LPIPSSubstitute` provides the in-repo substitute model
(documented there — scores are deterministic but not AlexNet-LPIPS
comparable).
"""

from __future__ import annotations

import warnings
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tools.image_utils import mask_background
from ..tools.metric_utils import calc_psnr, eval_depth, iou, rgb_l1

EVAL_N_SRC_VIEWS = [1, 3, 5, 7, 9]


DATASET_TYPE_TRAIN = "train"
DATASET_TYPE_TEST = "test"
DATASET_TYPE_KNOWN = "known"
DATASET_TYPE_UNKNOWN = "unseen"


def is_train_frame(frame_type) -> np.ndarray:
    """Bool array: does each frame type string start with 'train'?
    (reference dataset/utils.py:71 `is_train_frame`)."""
    if isinstance(frame_type, str):
        frame_type = [frame_type]
    return np.asarray(
        [str(t).startswith(DATASET_TYPE_TRAIN) for t in frame_type]
    )


def is_known_frame(frame_type) -> np.ndarray:
    """Bool array: does each frame type string end with 'known'?
    (reference dataset/utils.py:86 `is_known_frame`)."""
    if isinstance(frame_type, str):
        frame_type = [frame_type]
    return np.asarray(
        [str(t).endswith(DATASET_TYPE_KNOWN) for t in frame_type]
    )


def _resize(x: jnp.ndarray, hw: Tuple[int, int], mode: str) -> jnp.ndarray:
    if x.shape[1:3] == tuple(hw):
        return x
    method = "bilinear" if mode == "bilinear" else "nearest"
    return jax.image.resize(
        x, (x.shape[0],) + tuple(hw) + (x.shape[-1],), method=method
    )


def eval_batch(
    frame_data,
    implicitron_render,
    bg_color="black",
    mask_thr: float = 0.5,
    lpips_model=None,
    **kwargs,
) -> Dict[str, Any]:
    """Metrics for one new-view-synthesis batch (reference :147).

    The first frame is the synthesis target; the remaining frames are the
    known source views.  `implicitron_render` is a dict with
    images_render / masks_render / depths_render (or the reference's
    image_render / mask_render / depth_render names).
    """
    if frame_data.image_rgb is None:
        raise ValueError("Image is not in the evaluation batch.")

    def _pred(*names):
        for n in names:
            if isinstance(implicitron_render, dict):
                if implicitron_render.get(n) is not None:
                    return implicitron_render[n]
            elif getattr(implicitron_render, n, None) is not None:
                return getattr(implicitron_render, n)
        return None

    image_resol = frame_data.image_rgb.shape[1:3]
    image_render = _pred("images_render", "image_render")
    mask_render = _pred("masks_render", "mask_render")
    depth_render = _pred("depths_render", "depth_render")
    if image_render is None:
        raise ValueError("A required predicted field image_render is missing")

    # target frame only, resized to the g.t. resolution (bilinear for rgb,
    # nearest for mask/depth, reference :208)
    image_render = jnp.clip(
        _resize(image_render[:1], image_resol, "bilinear"), 0.0, 1.0
    )
    if mask_render is not None:
        mask_render = _resize(mask_render[:1], image_resol, "nearest")
    if depth_render is not None:
        depth_render = _resize(depth_render[:1], image_resol, "nearest")

    image_rgb = frame_data.image_rgb[:1]
    fg_probability = (
        frame_data.fg_probability[:1]
        if frame_data.fg_probability is not None
        else None
    )
    depth_map = (
        frame_data.depth_map[:1] if frame_data.depth_map is not None else None
    )
    depth_mask = getattr(frame_data, "depth_mask", None)
    if depth_map is not None and depth_mask is not None:
        depth_map = depth_map * depth_mask[:1]
    mask_crop = getattr(frame_data, "mask_crop", None)

    frame_type = getattr(frame_data, "frame_type", None)
    if frame_type is not None and not isinstance(frame_type, (list, tuple)):
        frame_type = [frame_type]
    if frame_type is not None and len(frame_type) > 1:
        it = is_train_frame(frame_type)
        if not (it[1:] == it[1]).all():
            raise ValueError(
                "All (conditioning) frames in the eval batch have to be "
                "either train/test."
            )

    if fg_probability is None:
        warnings.warn("fg_probability is None, assuming the whole image is fg.")
        mask_fg = jnp.ones_like(image_rgb[..., :1])
    else:
        mask_fg = (fg_probability >= mask_thr).astype(image_rgb.dtype)
    if mask_crop is None:
        mask_crop = jnp.ones_like(mask_fg)
    else:
        mask_crop = mask_crop[:1]
    if depth_map is None or float(jnp.sum(depth_map)) <= 0:
        warnings.warn("Empty or missing depth map in evaluation!")

    image_rgb_masked = mask_background(image_rgb, mask_fg, bg_color=bg_color)

    results: Dict[str, Any] = {}
    if mask_render is not None:
        results["iou"] = float(iou(mask_render, mask_fg, mask=mask_crop))

    for loss_fg_mask, name_postfix in (
        (mask_crop, "_masked"),
        (mask_fg, "_fg"),
    ):
        loss_mask_now = mask_crop * loss_fg_mask
        results["psnr" + name_postfix] = float(
            jnp.mean(calc_psnr(image_render, image_rgb_masked, loss_mask_now))
        )
        results["rgb_l1" + name_postfix] = float(
            jnp.mean(rgb_l1(image_render, image_rgb_masked, loss_mask_now))
        )
        if (
            name_postfix == "_fg"
            and depth_map is not None
            and depth_render is not None
        ):
            _, abs_ = eval_depth(
                depth_render, depth_map,
                get_best_scale=True, mask=loss_mask_now, crop=5,
            )
            results["depth_abs" + name_postfix] = float(jnp.mean(abs_))

    results["psnr_full_image"] = float(
        jnp.mean(calc_psnr(image_render, image_rgb, mask_crop))
    )
    results["rgb_l1_full_image"] = float(
        jnp.mean(rgb_l1(image_render, image_rgb, mask_crop))
    )
    # back-compat aliases used by earlier revisions of this library
    results["psnr"] = results["psnr_full_image"]
    results["rgb_l1"] = results["rgb_l1_full_image"]

    lpips_metric_name = None
    if lpips_model is not None:
        # A substitute model (tools.lpips.LPIPSSubstitute) is NOT
        # numerically comparable to AlexNet-LPIPS: its scores go under
        # distinct `lpips_substitute_*` keys and are tagged in `meta` so
        # downstream aggregation can't silently treat them as LPIPS.
        is_sub = bool(getattr(lpips_model, "is_substitute", False))
        key_base = "lpips_substitute" if is_sub else "lpips"
        lpips_metric_name = getattr(
            lpips_model, "metric_name", "alexnet-lpips"
        )
        for gt_image_type, gt_im in (
            ("_full_image", image_rgb),
            ("_masked", image_rgb_masked),
        ):
            im1 = jnp.moveaxis(2.0 * jnp.clip(gt_im, 0, 1) - 1.0, -1, 1)
            im2 = jnp.moveaxis(2.0 * image_render - 1.0, -1, 1)
            results[key_base + gt_image_type] = float(
                lpips_model.forward(im1, im2)
            )

    results["meta"] = {
        "batch_size": int(frame_data.image_rgb.shape[0]),
        "frame_type": str(frame_type[0]) if frame_type else "test_unseen",
    }
    if lpips_metric_name is not None:
        results["meta"]["lpips_metric"] = lpips_metric_name
    return results


def average_per_batch_results(
    results_per_batch: List[Dict[str, Any]],
    idx: Optional[Sequence[int]] = None,
) -> dict:
    """Average per-batch metric dicts, optionally over a subset
    (reference :374)."""
    result_keys = [k for k in results_per_batch[0].keys() if k != "meta"]
    if idx is not None:
        results_per_batch = [results_per_batch[i] for i in idx]
    if len(results_per_batch) == 0:
        return {k: float("NaN") for k in result_keys}
    return {
        k: float(
            np.nanmean(
                np.asarray(
                    [
                        r[k] if r.get(k) is not None else np.nan
                        for r in results_per_batch
                    ],
                    np.float64,
                )
            )
        )
        for k in result_keys
    }


def _reduce_camera_iou_overlap(ious: jnp.ndarray, topk: int = 2):
    """Camera difficulty = mean IoU of the two most-overlapping cameras
    (reference :408)."""
    k = min(topk, max(int(ious.shape[0]) - 1, 1))
    top, _ = jax.lax.top_k(ious, k)
    return jnp.mean(top)


def _get_camera_difficulty_bin_edges(
    camera_difficulty_bin_breaks: Tuple[float, float]
):
    """Edges/names of the hard/medium/easy camera-difficulty bins
    (reference :417)."""
    _eps = 1e-5
    lower, upper = camera_difficulty_bin_breaks
    edges = np.asarray([0.0 - _eps, lower, upper, 1.0 + _eps], np.float32)
    return edges, ["hard", "medium", "easy"]


def summarize_nvs_eval_results(
    per_batch_eval_results: List[Dict[str, Any]],
    is_multisequence: bool = False,
    camera_difficulty_bin_breaks: Tuple[float, float] = (0.97, 0.98),
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Aggregate per-batch metrics into per-set (and per-n-src-views, and
    per-camera-difficulty when present) summaries (reference :419)."""
    n_batches = len(per_batch_eval_results)
    eval_sets: List[Optional[str]] = [None]
    if is_multisequence:
        eval_sets = ["train", "test"]
    batch_sizes = np.asarray(
        [r["meta"]["batch_size"] for r in per_batch_eval_results]
    )
    is_train = is_train_frame(
        [r["meta"]["frame_type"] for r in per_batch_eval_results]
    )
    difficulties = np.asarray(
        [
            r["meta"].get("camera_difficulty", np.nan)
            for r in per_batch_eval_results
        ],
        np.float64,
    )

    results = []
    for SET in eval_sets:
        if SET is None:
            ok_set = np.ones(n_batches, dtype=bool)
            set_name = "test"
        else:
            ok_set = is_train == (SET == "train")
            set_name = SET

        results.append(
            {
                "subset": set_name,
                "subsubset": "diff=all",
                "metrics": average_per_batch_results(
                    per_batch_eval_results, idx=np.where(ok_set)[0]
                ),
            }
        )

        if np.isfinite(difficulties).any():
            edges, names = _get_camera_difficulty_bin_edges(
                camera_difficulty_bin_breaks
            )
            for bi, bname in enumerate(names):
                ok_bin = (
                    ok_set
                    & (difficulties > edges[bi])
                    & (difficulties <= edges[bi + 1])
                )
                results.append(
                    {
                        "subset": set_name,
                        "subsubset": f"diff={bname}",
                        "metrics": average_per_batch_results(
                            per_batch_eval_results, idx=np.where(ok_bin)[0]
                        ),
                    }
                )

        if is_multisequence:
            n_src_views = batch_sizes - 1
            for n_src in EVAL_N_SRC_VIEWS:
                ok_src = ok_set & (n_src_views == n_src)
                results.append(
                    {
                        "subset": set_name,
                        "subsubset": f"n_src={int(n_src)}",
                        "metrics": average_per_batch_results(
                            per_batch_eval_results, idx=np.where(ok_src)[0]
                        ),
                    }
                )

    aux_out = {"results": results}
    return flatten_nvs_results(results), aux_out


def _get_flat_nvs_metric_key(result, metric_name) -> str:
    return f"{metric_name}|subset={result['subset']}|{result['subsubset']}"


def flatten_nvs_results(results) -> Dict[str, Any]:
    """[{subset, subsubset, metrics}] -> flat {key: value} (reference
    :499)."""
    results_flat = {}
    for result in results:
        for metric_name, metric_val in result["metrics"].items():
            key = _get_flat_nvs_metric_key(result, metric_name)
            assert key not in results_flat
            results_flat[key] = metric_val
    return results_flat


def _ordered_set(list_):
    return list(OrderedDict((i, 0) for i in list_).keys())


def pretty_print_nvs_metrics(results) -> None:
    """Plain-text table of the aggregate metrics (reference :527, without
    the tabulate dependency)."""
    subsets, subsubsets = [
        _ordered_set([r[k] for r in results]) for k in ("subset", "subsubset")
    ]
    metrics = _ordered_set(
        [metric for r in results for metric in r["metrics"]]
    )
    for subset in subsets:
        rows = []
        for metric in metrics:
            vals = []
            for subsubset in subsubsets:
                mv = [
                    r["metrics"][metric]
                    for r in results
                    if r["subsubset"] == subsubset and r["subset"] == subset
                ]
                vals.extend(mv)
            if vals:
                rows.append((metric, vals))
        if rows:
            print(f"===== NVS results; subset={subset} =====")
            header = ["metric"] + subsubsets
            widths = [max(len(h), 12) for h in header]
            print("  ".join(h.ljust(w) for h, w in zip(header, widths)))
            for metric, vals in rows:
                cells = [metric] + [f"{v:.4f}" for v in vals]
                print(
                    "  ".join(c.ljust(w) for c, w in zip(cells, widths))
                )


def aggregate_nvs_results(task_results):
    """Average a list of (lists of) NVS summary results over tasks
    (reference :564).  Also accepts a flat list of per-batch metric dicts
    for backward compatibility, returning their plain average."""
    if (
        task_results
        and isinstance(task_results[0], dict)
        and "metrics" not in task_results[0]
    ):
        return average_per_batch_results(task_results)
    task_results_cat = [
        r_ if isinstance(r, list) else r
        for r in task_results
        for r_ in (r if isinstance(r, list) else [r])
    ]
    subsets, subsubsets = [
        _ordered_set([r[k] for r in task_results_cat])
        for k in ("subset", "subsubset")
    ]
    metrics = _ordered_set(
        [metric for r in task_results_cat for metric in r["metrics"]]
    )
    average_results = []
    for subset in subsets:
        for subsubset in subsubsets:
            metrics_lists = [
                r["metrics"]
                for r in task_results_cat
                if r["subsubset"] == subsubset and r["subset"] == subset
            ]
            avg_metrics = {}
            for metric in metrics:
                avg_metrics[metric] = float(
                    np.nanmean(
                        np.asarray([ml[metric] for ml in metrics_lists])
                    )
                )
            average_results.append(
                {
                    "subset": subset,
                    "subsubset": subsubset,
                    "metrics": avg_metrics,
                }
            )
    return average_results
