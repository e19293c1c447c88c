"""Host-side augmentation pipeline (numpy + cv2).

Same op set and constants as the reference's functional pipeline over the
(image, masks, boxes, labels) quadruple
(/root/reference/models/transform.py:431-458 train, :411-429 val):

ConvertFromInts -> ToAbsoluteCoords -> PhotometricDistort -> Expand(<=4x,
gray 128) -> RandomSampleCrop (IoU-constrained, 50 tries, crowd-aware) ->
RandomMirror -> Resize(square) -> ToPercentCoords.

Differences from the reference (deliberate):
* a passed-in ``numpy.random.Generator`` instead of global numpy random
  (reproducible per-sample, safe with worker threads);
* masks stay (N, H, W) uint8 end-to-end; crops/resizes use cv2 nearest
  for masks (reference uses default bilinear then keeps float grey
  values until the loss binarizes — we binarize at the same >0.5 point).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import cv2
import numpy as np

# RGB order (inst_model/yolact/utils/utils.py:33-37)
MEANS = np.array((123.68, 116.78, 103.94), np.float32)
STD = np.array((58.40, 57.12, 57.38), np.float32)

_CROP_MODES = (None, (0.1, None), (0.3, None), (0.7, None), (0.9, None),
               (None, None))


def normalize_image(image: np.ndarray) -> np.ndarray:
    """(image - mean) / std, RGB float32."""
    return (image.astype(np.float32) - MEANS) / STD


def photometric_distort(image: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Brightness/contrast/saturation/hue jitter (transform.py:37-136)."""
    img = image.astype(np.float32)
    if rng.integers(2):
        img += rng.uniform(-32, 32)

    contrast_first = bool(rng.integers(2))

    def contrast(x):
        if rng.integers(2):
            x *= rng.uniform(0.5, 1.5)
        return x

    if contrast_first:
        img = contrast(img)
    img = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    if rng.integers(2):
        img[:, :, 1] *= rng.uniform(0.5, 1.5)
    if rng.integers(2):
        img[:, :, 0] += rng.uniform(-18, 18)
        img[:, :, 0][img[:, :, 0] > 360.0] -= 360.0
        img[:, :, 0][img[:, :, 0] < 0.0] += 360.0
    img = cv2.cvtColor(img, cv2.COLOR_HSV2RGB)
    if not contrast_first:
        img = contrast(img)
    return img


def expand(image, masks, boxes_abs, rng):
    """Paste onto a larger gray canvas (transform.py:142-168), p=0.5."""
    if rng.integers(2):
        return image, masks, boxes_abs
    h, w, d = image.shape
    ratio = rng.uniform(1, 4)
    left = int(rng.uniform(0, w * ratio - w))
    top = int(rng.uniform(0, h * ratio - h))
    eh, ew = int(h * ratio), int(w * ratio)

    canvas = np.full((eh, ew, d), 128, dtype=image.dtype)
    canvas[top:top + h, left:left + w] = image
    mcanvas = np.zeros((masks.shape[0], eh, ew), dtype=masks.dtype)
    mcanvas[:, top:top + h, left:left + w] = masks
    boxes = boxes_abs.copy()
    boxes[:, :2] += (left, top)
    boxes[:, 2:] += (left, top)
    return canvas, mcanvas, boxes


def random_sample_crop(image, masks, boxes_abs, labels, is_crowd, rng,
                       max_rounds: int = 20):
    """IoU-constrained random crop (transform.py:173-295).

    Keeps instances whose centers fall inside the crop; requires at least
    one non-crowd survivor. The reference loops forever re-drawing modes;
    we bound it at max_rounds (returning the input unchanged) to keep the
    pipeline total.
    """
    for _ in range(max_rounds):
        mode = _CROP_MODES[rng.integers(len(_CROP_MODES))]
        if mode is None:
            return image, masks, boxes_abs, labels, is_crowd
        min_iou = mode[0] if mode[0] is not None else float("-inf")
        max_iou = mode[1] if mode[1] is not None else float("inf")

        height, width, _ = image.shape
        for _ in range(50):
            w = rng.uniform(0.3 * width, width)
            h = rng.uniform(0.3 * height, height)
            if h / w < 0.5 or h / w > 2:
                continue
            left = rng.uniform(0, width - w)
            top = rng.uniform(0, height - h)
            rect = np.array([int(left), int(top), int(left + w), int(top + h)])

            # IoU of each gt box vs the crop rect
            ixy1 = np.maximum(boxes_abs[:, :2], rect[:2])
            ixy2 = np.minimum(boxes_abs[:, 2:], rect[2:])
            inter = np.clip(ixy2 - ixy1, 0, None).prod(axis=1)
            area_a = (boxes_abs[:, 2] - boxes_abs[:, 0]) * (boxes_abs[:, 3] - boxes_abs[:, 1])
            area_b = (rect[2] - rect[0]) * (rect[3] - rect[1])
            overlap = inter / np.maximum(area_a + area_b - inter, 1e-9)
            # reference condition (transform.py:242): retry only when BOTH
            # the min is below min_iou AND the max exceeds max_iou
            if overlap.min() < min_iou and max_iou < overlap.max():
                continue

            centers = (boxes_abs[:, :2] + boxes_abs[:, 2:]) / 2.0
            keep = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1])
                    & (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1]))
            if not keep.any() or not (keep & ~is_crowd).any():
                continue

            new_boxes = boxes_abs[keep].copy()
            new_boxes[:, :2] = np.maximum(new_boxes[:, :2], rect[:2]) - rect[:2]
            new_boxes[:, 2:] = np.minimum(new_boxes[:, 2:], rect[2:]) - rect[:2]
            return (image[rect[1]:rect[3], rect[0]:rect[2]],
                    masks[keep][:, rect[1]:rect[3], rect[0]:rect[2]],
                    new_boxes, labels[keep], is_crowd[keep])
    return image, masks, boxes_abs, labels, is_crowd


def random_mirror(image, masks, boxes_abs, rng):
    """Horizontal flip, p=0.5 (transform.py:300-309)."""
    if rng.integers(2):
        w = image.shape[1]
        image = image[:, ::-1]
        masks = masks[:, :, ::-1]
        boxes = boxes_abs.copy()
        x1 = w - boxes[:, 2]
        x2 = w - boxes[:, 0]
        boxes[:, 0], boxes[:, 2] = x1, x2
        return image, masks, boxes
    return image, masks, boxes_abs


def resize(image, masks, boxes_abs, out_hw: Tuple[int, int]):
    """Square resize of image+masks+boxes (transform.py:314-334)."""
    ih, iw = image.shape[:2]
    oh, ow = out_hw
    image = cv2.resize(image, (ow, oh))
    if masks.shape[0]:
        resized = [cv2.resize(m.astype(np.uint8), (ow, oh),
                              interpolation=cv2.INTER_NEAREST) for m in masks]
        masks = np.stack(resized)
    else:
        masks = np.zeros((0, oh, ow), dtype=masks.dtype)
    boxes = boxes_abs.copy()
    boxes[:, [0, 2]] *= ow / iw
    boxes[:, [1, 3]] *= oh / ih
    return image, masks, boxes


def resize_keep_aspect(image, masks, boxes_abs, out_hw: Tuple[int, int],
                       fill=128):
    """Aspect-preserving fit into ``out_hw`` + gray top-left pad.

    The bucketed analogue of GeneralizedRCNNTransform's min800/max1333
    resize-then-pad (reference transform.py:256-386): scale so the image
    fits inside the bucket, pad the remainder. Boxes stay in PADDED-image
    absolute coords (normalization by out_hw happens in the caller)."""
    ih, iw = image.shape[:2]
    oh, ow = out_hw
    s = min(oh / ih, ow / iw)
    nh, nw = max(1, int(round(ih * s))), max(1, int(round(iw * s)))
    image, masks, boxes = resize(image, masks, boxes_abs, (nh, nw))
    image, masks = pad_to(image, masks, out_hw, fill=fill)
    return image, masks, boxes


class Augmentation:
    """Train-time pipeline; call with normalized boxes, returns normalized
    boxes and the UN-normalized (0-255 RGB float) image.

    ``keep_aspect=True`` switches the final square-stretch resize to the
    aspect-preserving fit+pad used by resolution-bucketed training; the
    per-call ``out_hw`` overrides the constructor shape (one value per
    bucket)."""

    def __init__(self, input_shape: Tuple[int, int], keep_aspect: bool = False):
        self.input_shape = tuple(input_shape)
        self.keep_aspect = keep_aspect

    def __call__(self, image, masks, boxes_norm, labels, is_crowd,
                 rng: np.random.Generator,
                 out_hw: Optional[Tuple[int, int]] = None):
        h, w = image.shape[:2]
        img = image.astype(np.float32)
        boxes = boxes_norm * np.array([w, h, w, h], np.float32)

        img = photometric_distort(img, rng)
        img, masks, boxes = expand(img, masks, boxes, rng)
        img, masks, boxes, labels, is_crowd = random_sample_crop(
            img, masks, boxes, labels, is_crowd, rng)
        img, masks, boxes = random_mirror(img, masks, boxes, rng)
        target = tuple(out_hw) if out_hw is not None else self.input_shape
        if self.keep_aspect:
            img, masks, boxes = resize_keep_aspect(img, masks, boxes, target)
        else:
            img, masks, boxes = resize(img, masks, boxes, target)

        hh, ww = img.shape[:2]
        boxes = boxes / np.array([ww, hh, ww, hh], np.float32)
        return img, masks, boxes, labels, is_crowd


def pad_to(image, masks, out_hw, fill=128):
    """Paste onto a gray canvas at the top-left (transform.py:361-377 Pad)."""
    h, w = image.shape[:2]
    oh, ow = out_hw
    canvas = np.full((oh, ow, image.shape[2]), fill, dtype=image.dtype)
    canvas[:h, :w] = image
    mcanvas = np.zeros((masks.shape[0], oh, ow), dtype=masks.dtype)
    mcanvas[:, :h, :w] = masks
    return canvas, mcanvas


def resize_scale(image, masks, boxes_abs, scale: float = 0.8):
    """Relative-scale resize (transform.py:337-359 ResizeS)."""
    h, w = image.shape[:2]
    return resize(image, masks, boxes_abs, (int(h * scale), int(w * scale)))


class BaseTransform:
    """Val/eval pipeline: resize only (transform.py:411-429)."""

    def __init__(self, input_shape: Tuple[int, int], keep_aspect: bool = False):
        self.input_shape = tuple(input_shape)
        self.keep_aspect = keep_aspect

    def __call__(self, image, masks, boxes_norm, labels, is_crowd,
                 rng: Optional[np.random.Generator] = None,
                 out_hw: Optional[Tuple[int, int]] = None):
        h, w = image.shape[:2]
        boxes = boxes_norm * np.array([w, h, w, h], np.float32)
        target = tuple(out_hw) if out_hw is not None else self.input_shape
        fn = resize_keep_aspect if self.keep_aspect else resize
        img, masks, boxes = fn(image.astype(np.float32), masks, boxes, target)
        hh, ww = img.shape[:2]
        boxes = boxes / np.array([ww, hh, ww, hh], np.float32)
        return img, masks, boxes, labels, is_crowd
