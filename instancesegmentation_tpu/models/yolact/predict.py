"""YOLACT inference: jitted decode + Fast-NMS + prototype mask assembly,
plus the host-side finishing (resize/crop/argmax) that depends on the
original image size.

Mirrors /root/reference/inst_model/yolact/utils/utils_bbox.py
BBoxUtility.decode_nms (:170-243) with a TPU-static split:

device (fixed shapes, jit):  decode -> strip background -> Fast-NMS ->
  sigmoid(proto @ coef^T) at proto resolution  -> (max_det,) slots + valid
host (variable image size):  scale boxes to pixels (yolact_correct_boxes),
  bilinear-resize mask probs to the original resolution, crop to boxes,
  per-pixel instance argmax, 0.5 binarize — the same op order as the
  reference (:216-242).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.ops import boxes as box_ops
from instancesegmentation_tpu.ops import nms as nms_ops


class RawDetections(NamedTuple):
    boxes: jnp.ndarray        # (B, D, 4) normalized xyxy
    scores: jnp.ndarray       # (B, D)
    classes: jnp.ndarray      # (B, D) int32, 0-based (background stripped)
    mask_probs: jnp.ndarray   # (B, D, Hp, Wp) sigmoid probabilities
    valid: jnp.ndarray        # (B, D) bool


def make_infer_fn(model, anchors, confidence: float, nms_iou: float,
                  top_k: int = 200, max_detections: int = 100,
                  traditional_nms: bool = False):
    """Build a jittable batch inference fn: images -> RawDetections.

    ``model`` must be an eval-mode Yolact (softmaxed classes).
    ``traditional_nms`` selects the exact per-class NMS path
    (utils_bbox.py:102-140) instead of Fast-NMS."""
    anchors = jnp.asarray(anchors)

    def single(pred_box, pred_class, pred_coef, proto):
        decoded = box_ops.decode_yolact(pred_box, anchors)
        scores = pred_class[:, 1:]                       # strip background
        if traditional_nms:
            out = nms_ops.traditional_nms(
                decoded, scores, pred_coef, score_thresh=confidence,
                iou_thresh=nms_iou, max_detections=max_detections)
        else:
            out = nms_ops.fast_nms(decoded, scores, pred_coef,
                                   score_thresh=confidence,
                                   iou_thresh=nms_iou,
                                   top_k=top_k, max_detections=max_detections)
        # proto (Hp, Wp, K) @ coef (D, K) -> (D, Hp, Wp), on the MXU
        probs = jax.nn.sigmoid(
            jnp.einsum("hwk,dk->dhw", proto, out.coefs))
        return out.boxes, out.scores, out.classes, probs, out.valid

    def infer(variables, images) -> RawDetections:
        pred_boxes, pred_classes, pred_coefs, proto = model.apply(
            variables, images, train=False)
        b, s, c, p, v = jax.vmap(single)(pred_boxes, pred_classes,
                                         pred_coefs, proto)
        return RawDetections(b, s, c, p, v)

    return infer


def finish_detections(raw_i, image_hw: Tuple[int, int],
                      mask_thresh: float = 0.5):
    """Host-side finishing for ONE image (numpy).

    Args:
      raw_i: RawDetections indexed at one batch element (numpy arrays).
      image_hw: original (H, W).
    Returns dict with 'boxes' (N,4 px), 'scores' (N,), 'classes' (N,),
      'masks' (N,H,W) bool, 'masks_arg' (H,W) int32 (0 = background,
      i+1 = instance i), like the reference's detect_image consumables
      (inst_model/yolact/yolact.py:158-168).
    """
    import cv2
    valid = np.asarray(raw_i.valid)
    n = int(valid.sum())
    h, w = image_hw
    if n == 0:
        return {"boxes": np.zeros((0, 4), np.float32),
                "scores": np.zeros((0,), np.float32),
                "classes": np.zeros((0,), np.int32),
                "masks": np.zeros((0, h, w), bool),
                "masks_arg": np.zeros((h, w), np.int32)}

    boxes_norm = np.asarray(raw_i.boxes)[valid]
    scores = np.asarray(raw_i.scores)[valid]
    classes = np.asarray(raw_i.classes)[valid]
    probs = np.asarray(raw_i.mask_probs)[valid]          # (N, Hp, Wp)

    boxes_px = np.asarray(
        box_ops.yolact_correct_boxes(jnp.asarray(boxes_norm), (h, w)))

    # bilinear upsample to original res (utils_bbox.py:228), crop (:230)
    up = np.stack([cv2.resize(p, (w, h), interpolation=cv2.INTER_LINEAR)
                   for p in probs])
    xs = np.arange(w, dtype=np.float32)
    ys = np.arange(h, dtype=np.float32)
    in_x = (xs[None, :] >= boxes_px[:, 0, None]) & (xs[None, :] < boxes_px[:, 2, None])
    in_y = (ys[None, :] >= boxes_px[:, 1, None]) & (ys[None, :] < boxes_px[:, 3, None])
    up = up * (in_y[:, :, None] & in_x[:, None, :])

    masks_arg = np.argmax(up, axis=0).astype(np.int32)
    any_mask = (up > mask_thresh).any(axis=0)
    masks_arg = np.where(any_mask, masks_arg + 1, 0)
    masks = up > mask_thresh
    return {"boxes": boxes_px.astype(np.float32), "scores": scores,
            "classes": classes, "masks": masks, "masks_arg": masks_arg}
