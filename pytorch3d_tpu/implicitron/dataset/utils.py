"""Dataset image/bbox/camera utilities (host-side data prep).

Parity: reference implicitron/dataset/utils.py (`get_bbox_from_mask` :86,
`crop_around_box` :114, `get_clamp_bbox` :157, `rescale_bbox` :187,
`resize_image` :205 — aspect-preserving with zero padding + crop mask,
`_convert_ndc_to_pixels` :324, `adjust_camera_to_bbox_crop_` :348,
`adjust_camera_to_image_scale_` :375) and frame-type helpers (:71).

Images here are channels-LAST (H, W, C) numpy arrays (this library's
layout); cameras are immutable pytrees, so the adjust functions return a
NEW camera instead of mutating.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import numpy as np

DATASET_TYPE_TRAIN = "train"
DATASET_TYPE_TEST = "test"
DATASET_TYPE_KNOWN = "known"
DATASET_TYPE_UNKNOWN = "unseen"


def is_train_frame(frame_type) -> np.ndarray:
    if isinstance(frame_type, str):
        frame_type = [frame_type]
    return np.asarray(
        [str(t).startswith(DATASET_TYPE_TRAIN) for t in frame_type]
    )


def is_known_frame(frame_type) -> np.ndarray:
    if isinstance(frame_type, str):
        frame_type = [frame_type]
    return np.asarray(
        [str(t).endswith(DATASET_TYPE_KNOWN) for t in frame_type]
    )


def get_1d_bounds(arr: np.ndarray) -> Tuple[int, int]:
    nz = np.flatnonzero(arr)
    return int(nz[0]), int(nz[-1]) + 1


def get_bbox_from_mask(
    mask: np.ndarray, thr: float, decrease_quant: float = 0.05
) -> Tuple[int, int, int, int]:
    """xywh bbox of the mask's support, lowering thr until non-empty
    (reference :86)."""
    if mask.size == 0:
        warnings.warn("Empty mask is provided for bbox extraction.")
        return 0, 0, 1, 1
    if mask.min() < 0.0:
        warnings.warn("Negative values in the mask for bbox extraction.")
        mask = mask.clip(min=0.0)
    masks_for_box = np.zeros_like(mask)
    while masks_for_box.sum() <= 1.0:
        masks_for_box = (mask > thr).astype(np.float32)
        thr -= decrease_quant
    if thr <= 0.0:
        warnings.warn(f"Empty masks_for_bbox (thr={thr}) => using full image.")
    x0, x1 = get_1d_bounds(masks_for_box.sum(axis=0))
    y0, y1 = get_1d_bounds(masks_for_box.sum(axis=1))
    return x0, y0, x1 - x0, y1 - y0


def bbox_xyxy_to_xywh(xyxy: np.ndarray) -> np.ndarray:
    return np.concatenate([xyxy[:2], xyxy[2:] - xyxy[:2]])


def bbox_xywh_to_xyxy(
    xywh: np.ndarray, clamp_size: Optional[float] = None
) -> np.ndarray:
    wh = xywh[2:]
    if clamp_size is not None:
        wh = np.clip(wh, clamp_size, None)
    return np.concatenate([xywh[:2], xywh[:2] + wh])


def get_clamp_bbox(
    bbox: np.ndarray, box_crop_context: float = 0.0, image_path: str = ""
) -> np.ndarray:
    """Expand an xywh bbox by `box_crop_context` -> float xyxy
    (reference :157)."""
    bbox = np.asarray(bbox, np.float64).copy()
    if box_crop_context > 0.0:
        c = box_crop_context
        bbox[0] -= bbox[2] * c / 2
        bbox[1] -= bbox[3] * c / 2
        bbox[2] += bbox[2] * c
        bbox[3] += bbox[3] * c
    if (bbox[2:] <= 1.0).any():
        raise ValueError(
            f"squashed image {image_path}!! The bounding box contains no pixels."
        )
    bbox[2:] = np.clip(bbox[2:], 2, None)
    return bbox_xywh_to_xyxy(bbox, clamp_size=2)


def clamp_box_to_image_bounds_and_round(
    bbox_xyxy: np.ndarray, image_size_hw: Tuple[int, int]
) -> np.ndarray:
    out = np.asarray(bbox_xyxy, np.float64).copy()
    out[[0, 2]] = np.clip(out[[0, 2]], 0, image_size_hw[-1])
    out[[1, 3]] = np.clip(out[[1, 3]], 0, image_size_hw[-2])
    return np.round(out).astype(np.int64)


def rescale_bbox(bbox, orig_res, new_res) -> np.ndarray:
    assert bbox is not None
    assert np.prod(orig_res) > 1e-8
    rel_size = (new_res[0] / orig_res[0] + new_res[1] / orig_res[1]) / 2.0
    return np.asarray(bbox, np.float64) * rel_size


def crop_around_box(
    image: np.ndarray, bbox_xyxy: np.ndarray, impath: str = ""
) -> np.ndarray:
    """Crop (H, W, C) by int xyxy (reference :114)."""
    bbox = clamp_box_to_image_bounds_and_round(
        bbox_xyxy, image.shape[:2]
    )
    out = image[bbox[1] : bbox[3], bbox[0] : bbox[2]]
    assert all(c > 0 for c in out.shape), f"squashed image {impath}"
    return out


def resize_image(
    image: np.ndarray,
    image_height: Optional[int],
    image_width: Optional[int],
    mode: str = "bilinear",
) -> Tuple[np.ndarray, float, np.ndarray]:
    """Aspect-preserving resize of (H, W, C) with zero padding to
    (image_height, image_width); returns (resized, scale, crop mask)
    (reference :205 — the crop mask becomes FrameData.mask_crop)."""
    if (
        image_height is None
        or image_width is None
        or image.shape[0] == 0
        or image.shape[1] == 0
    ):
        return image, 1.0, np.ones(image.shape[:2] + (1,), np.float32)

    from PIL import Image

    minscale = min(
        image_height / image.shape[0], image_width / image.shape[1]
    )
    new_h = max(1, int(round(minscale * image.shape[0])))
    new_w = max(1, int(round(minscale * image.shape[1])))
    resample = Image.BILINEAR if mode == "bilinear" else Image.NEAREST
    chans = []
    for c in range(image.shape[2]):
        chans.append(
            np.asarray(
                Image.fromarray(image[..., c].astype(np.float32), "F").resize(
                    (new_w, new_h), resample
                ),
                np.float32,
            )
        )
    imre = np.stack(chans, axis=-1)
    out = np.zeros((image_height, image_width, image.shape[2]), np.float32)
    out[:new_h, :new_w] = imre
    mask = np.zeros((image_height, image_width, 1), np.float32)
    mask[:new_h, :new_w] = 1.0
    return out, minscale, mask


def _convert_ndc_to_pixels(focal_length, principal_point, image_size_wh):
    half = np.asarray(image_size_wh, np.float64) / 2
    rescale = half.min()
    principal_point_px = half - np.asarray(principal_point) * rescale
    focal_length_px = np.asarray(focal_length) * rescale
    return focal_length_px, principal_point_px


def _convert_pixels_to_ndc(
    focal_length_px, principal_point_px, image_size_wh
):
    half = np.asarray(image_size_wh, np.float64) / 2
    rescale = half.min()
    principal_point = (half - np.asarray(principal_point_px)) / rescale
    focal_length = np.asarray(focal_length_px) / rescale
    return focal_length, principal_point


def adjust_camera_to_bbox_crop(
    camera, image_size_wh, clamp_bbox_xywh
):
    """New camera with focal/principal point remapped to the crop window
    (reference :348; returns a new camera, pytrees are immutable)."""
    import jax.numpy as jnp

    fl_px, pp_px = _convert_ndc_to_pixels(
        np.asarray(camera.focal_length)[0],
        np.asarray(camera.principal_point)[0],
        image_size_wh,
    )
    pp_px_cropped = pp_px - np.asarray(clamp_bbox_xywh[:2], np.float64)
    fl, pp = _convert_pixels_to_ndc(
        fl_px, pp_px_cropped, np.asarray(clamp_bbox_xywh[2:], np.float64)
    )
    return camera.replace(
        focal_length=jnp.asarray(fl, jnp.float32)[None],
        principal_point=jnp.asarray(pp, jnp.float32)[None],
    )


def adjust_camera_to_image_scale(
    camera, original_size_wh, new_size_wh
):
    """New camera with intrinsics scaled for the (aspect-preserving)
    resize (reference :375)."""
    import jax.numpy as jnp

    fl_px, pp_px = _convert_ndc_to_pixels(
        np.asarray(camera.focal_length)[0],
        np.asarray(camera.principal_point)[0],
        original_size_wh,
    )
    new_wh = np.asarray(new_size_wh, np.float64)
    scale = (new_wh / np.asarray(original_size_wh, np.float64)).min()
    fl, pp = _convert_pixels_to_ndc(
        fl_px * scale, pp_px * scale, new_wh
    )
    return camera.replace(
        focal_length=jnp.asarray(fl, jnp.float32)[None],
        principal_point=jnp.asarray(pp, jnp.float32)[None],
    )


class GenericWorkaround:
    """Kept for reference API compatibility (reference dataset/utils.py:28
    works around an OmegaConf + Generic-base dataclass issue; our
    plain-dict config system does not need it)."""


def is_known_frame_scalar(frame_type: str) -> bool:
    """Whether a single frame-type string marks a known frame
    (reference dataset/utils.py:48)."""
    return frame_type.endswith("known")


def transpose_normalize_image(image: np.ndarray) -> np.ndarray:
    """HWC uint8 -> CHW float in [0, 1] (reference dataset/utils.py:244;
    the reference's channel-first convention — FrameData in this
    framework is channel-last, these utilities keep the reference
    contract)."""
    im = np.atleast_3d(image).transpose((2, 0, 1))
    return im.astype(np.float32) / 255.0


def load_image(
    path: str, try_read_alpha: bool = False, pil_format: str = "RGB"
) -> np.ndarray:
    """(C, H, W) float image in [0, 1] (reference dataset/utils.py:249)."""
    from PIL import Image

    with Image.open(path) as pil_im:
        if try_read_alpha and pil_im.mode == "RGBA":
            im = np.array(pil_im)
        else:
            im = np.array(pil_im.convert(pil_format))
    return transpose_normalize_image(im)


def load_mask(path: str) -> np.ndarray:
    """(1, H, W) float mask in [0, 1] (reference dataset/utils.py:268)."""
    from PIL import Image

    with Image.open(path) as pil_im:
        mask = np.array(pil_im)
    return transpose_normalize_image(mask)


def load_16big_png_depth(depth_png: str) -> np.ndarray:
    """16-bit-as-float16 PNG depth (reference dataset/utils.py:295)."""
    from PIL import Image

    with Image.open(depth_png) as depth_pil:
        depth = (
            np.frombuffer(
                np.array(depth_pil, dtype=np.uint16), dtype=np.float16
            )
            .astype(np.float32)
            .reshape((depth_pil.size[1], depth_pil.size[0]))
        )
    return depth


def load_1bit_png_mask(file: str) -> np.ndarray:
    """Binary (H, W) float mask (reference dataset/utils.py:307)."""
    from PIL import Image

    with Image.open(file) as pil_im:
        mask = (np.array(pil_im.convert("L")) > 0.0).astype(np.float32)
    return mask


def load_depth(path: str, scale_adjustment: float) -> np.ndarray:
    """(1, H, W) float depth with scale adjustment; .png only (the
    reference additionally supports .exr via OpenCV, dataset/utils.py:275
    — cv2 is not in this environment)."""
    if not path.lower().endswith(".png"):
        raise ValueError('unsupported depth file name "%s"' % path)
    d = load_16big_png_depth(path) * scale_adjustment
    d[~np.isfinite(d)] = 0.0
    return d[None]


def load_depth_mask(path: str) -> np.ndarray:
    """(1, H, W) binary depth mask from a 1-bit png (reference
    dataset/utils.py:313)."""
    if not path.lower().endswith(".png"):
        raise ValueError('unsupported depth mask file name "%s"' % path)
    return load_1bit_png_mask(path)[None]


def safe_as_tensor(data, dtype):
    """None-propagating array conversion (reference dataset/utils.py:320)."""
    import jax.numpy as jnp

    return jnp.asarray(data, dtype) if data is not None else None


def load_pointcloud(pcl_path, max_points: int = 0):
    """Load a point cloud via the pluggable IO, optionally subsampled
    (reference dataset/utils.py:408)."""
    from ...io import IO

    pcl = IO().load_pointcloud(pcl_path)
    if max_points > 0:
        pcl = pcl.subsample(max_points)
    return pcl


def adjust_camera_to_bbox_crop_(camera, image_size_wh, clamp_bbox_xywh):
    """Reference's in-place variant (dataset/utils.py:352); RETURNS the
    adjusted camera (JAX immutability)."""
    return adjust_camera_to_bbox_crop(camera, image_size_wh, clamp_bbox_xywh)


def adjust_camera_to_image_scale_(camera, original_size_wh, new_size_wh):
    """Reference's in-place variant (dataset/utils.py:380); RETURNS the
    adjusted camera."""
    return adjust_camera_to_image_scale(camera, original_size_wh, new_size_wh)
