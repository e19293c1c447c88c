"""Box geometry ops (pure jnp, static shapes, jit/vmap-safe).

Covers the numeric semantics of the reference's two box stacks:

* YOLACT-style (normalized coords, variances [0.1, 0.2]):
  /root/reference/inst_model/yolact/nets/yolact_training.py:10-42 (encode/jaccard)
  and /root/reference/inst_model/yolact/utils/utils_bbox.py:11-48 (decode).
* Mask R-CNN-style (pixel coords, per-coordinate weights + log-clip):
  /root/reference/inst_model/Mask_RCNN/net/network_files/det_utils.py:140-267
  (BoxCoder) and .../boxes.py:86-180 (area/iou/clip/remove_small).

All functions broadcast over arbitrary leading batch dims, so a batched
version is just the same call on a batched array (no per-image Python
loops — the TPU-native replacement for the reference's per-image code).
Boxes are ``[..., 4]`` in xyxy order unless a suffix says otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


# ---------------------------------------------------------------------------
# Format conversions
# ---------------------------------------------------------------------------

def point_form(boxes_cxcywh: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cxy = boxes_cxcywh[..., :2]
    wh = boxes_cxcywh[..., 2:]
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)


def center_size(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    xy1 = boxes_xyxy[..., :2]
    xy2 = boxes_xyxy[..., 2:]
    return jnp.concatenate([(xy1 + xy2) / 2, xy2 - xy1], axis=-1)


# ---------------------------------------------------------------------------
# Areas / IoU
# ---------------------------------------------------------------------------

def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas.

    box_a: (..., A, 4), box_b: (..., B, 4) -> (..., A, B).
    """
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    return wh[..., 0] * wh[..., 1]


def jaccard(box_a: jnp.ndarray, box_b: jnp.ndarray, iscrowd: bool = False,
            eps: float = EPS) -> jnp.ndarray:
    """Pairwise IoU (or intersection-over-area-of-a when ``iscrowd``).

    Mirrors yolact_training.py:21-42 including its ``eps`` regularizer, so
    degenerate (zero-area padded) boxes yield 0 instead of NaN.
    """
    inter = intersect(box_a, box_b)
    area_a = box_area(box_a)[..., :, None]
    area_b = box_area(box_b)[..., None, :]
    if iscrowd:
        return inter / (area_a + eps)
    return inter / (area_a + area_b - inter + eps)


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Torchvision-convention pairwise IoU (no eps; boxes.py:139-180).

    Callers must guarantee non-degenerate boxes (as the reference does).
    """
    inter = intersect(boxes1, boxes2)
    union = box_area(boxes1)[..., :, None] + box_area(boxes2)[..., None, :] - inter
    return inter / union


# ---------------------------------------------------------------------------
# YOLACT (SSD-style) encode / decode — normalized coords, variances
# ---------------------------------------------------------------------------

YOLACT_VARIANCES = (0.1, 0.2)


def encode_yolact(matched_xyxy: jnp.ndarray, anchors_cxcywh: jnp.ndarray,
                  variances=YOLACT_VARIANCES, eps: float = EPS) -> jnp.ndarray:
    """Box targets for matched gt vs anchors (yolact_training.py:10-19).

    ``eps`` guards the log for padded zero-size boxes (the reference never
    sees those because it uses ragged per-image tensors).
    """
    g_cxcy = (matched_xyxy[..., :2] + matched_xyxy[..., 2:]) / 2 - anchors_cxcywh[..., :2]
    g_cxcy = g_cxcy / (variances[0] * anchors_cxcywh[..., 2:])
    g_wh = (matched_xyxy[..., 2:] - matched_xyxy[..., :2]) / anchors_cxcywh[..., 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, eps)) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode_yolact(pred: jnp.ndarray, anchors_cxcywh: jnp.ndarray,
                  variances=YOLACT_VARIANCES) -> jnp.ndarray:
    """Apply predicted offsets to anchors -> xyxy (utils_bbox.py:11-25)."""
    cxy = anchors_cxcywh[..., :2] + pred[..., :2] * variances[0] * anchors_cxcywh[..., 2:]
    wh = anchors_cxcywh[..., 2:] * jnp.exp(pred[..., 2:] * variances[1])
    xy1 = cxy - wh / 2
    return jnp.concatenate([xy1, xy1 + wh], axis=-1)


# ---------------------------------------------------------------------------
# Mask R-CNN BoxCoder — pixel coords, weights, clipped exp
# ---------------------------------------------------------------------------

# math.log(1000. / 16) — det_utils.py:151
BBOX_XFORM_CLIP = 4.135166556742356


def encode_rcnn(reference_xyxy: jnp.ndarray, proposals_xyxy: jnp.ndarray,
                weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Regression targets t = f(gt, proposal) (det_utils.py:187-233)."""
    wx, wy, ww, wh = weights
    ex_w = proposals_xyxy[..., 2] - proposals_xyxy[..., 0]
    ex_h = proposals_xyxy[..., 3] - proposals_xyxy[..., 1]
    ex_cx = proposals_xyxy[..., 0] + 0.5 * ex_w
    ex_cy = proposals_xyxy[..., 1] + 0.5 * ex_h

    gt_w = reference_xyxy[..., 2] - reference_xyxy[..., 0]
    gt_h = reference_xyxy[..., 3] - reference_xyxy[..., 1]
    gt_cx = reference_xyxy[..., 0] + 0.5 * gt_w
    gt_cy = reference_xyxy[..., 1] + 0.5 * gt_h

    # Guard padded zero-size proposals/gt (validity masking happens in the loss).
    ex_w = jnp.maximum(ex_w, EPS)
    ex_h = jnp.maximum(ex_h, EPS)
    t = jnp.stack([
        wx * (gt_cx - ex_cx) / ex_w,
        wy * (gt_cy - ex_cy) / ex_h,
        ww * jnp.log(jnp.maximum(gt_w, EPS) / ex_w),
        wh * jnp.log(jnp.maximum(gt_h, EPS) / ex_h),
    ], axis=-1)
    return t


def decode_rcnn(rel_codes: jnp.ndarray, boxes_xyxy: jnp.ndarray,
                weights=(1.0, 1.0, 1.0, 1.0),
                bbox_xform_clip: float = BBOX_XFORM_CLIP) -> jnp.ndarray:
    """Apply regression deltas to boxes -> xyxy (det_utils.py:235-267)."""
    wx, wy, ww, wh = weights
    w = boxes_xyxy[..., 2] - boxes_xyxy[..., 0]
    h = boxes_xyxy[..., 3] - boxes_xyxy[..., 1]
    cx = boxes_xyxy[..., 0] + 0.5 * w
    cy = boxes_xyxy[..., 1] + 0.5 * h

    dx = rel_codes[..., 0] / wx
    dy = rel_codes[..., 1] / wy
    dw = jnp.clip(rel_codes[..., 2] / ww, max=bbox_xform_clip)
    dh = jnp.clip(rel_codes[..., 3] / wh, max=bbox_xform_clip)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h
    return jnp.stack([
        pred_cx - 0.5 * pred_w,
        pred_cy - 0.5 * pred_h,
        pred_cx + 0.5 * pred_w,
        pred_cy + 0.5 * pred_h,
    ], axis=-1)


# ---------------------------------------------------------------------------
# Clipping / filtering (mask-returning — static shapes on TPU)
# ---------------------------------------------------------------------------

def clip_boxes_to_image(boxes: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Clamp xyxy boxes into [0, W] x [0, H] (boxes.py:108-136)."""
    h, w = size_hw
    x = jnp.clip(boxes[..., 0::2], 0.0, w)
    y = jnp.clip(boxes[..., 1::2], 0.0, h)
    out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return out


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True where BOTH sides >= min_size (boxes.py:86-105, mask form).

    The reference returns kept indices (dynamic); on TPU we return a boolean
    validity mask with the same semantics.
    """
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def yolact_correct_boxes(boxes_norm: jnp.ndarray, image_shape_hw) -> jnp.ndarray:
    """Scale normalized boxes to image pixels and clamp (utils_bbox.py:142-152)."""
    h, w = image_shape_hw
    scale = jnp.asarray([w, h, w, h], dtype=boxes_norm.dtype)
    boxes = boxes_norm * scale
    xy1 = jnp.minimum(boxes[..., :2], boxes[..., 2:])
    xy2 = jnp.maximum(boxes[..., :2], boxes[..., 2:])
    xy1 = jnp.maximum(xy1, 0.0)
    xy2 = jnp.minimum(xy2, jnp.asarray([w, h], dtype=boxes_norm.dtype))
    return jnp.concatenate([xy1, xy2], axis=-1)
