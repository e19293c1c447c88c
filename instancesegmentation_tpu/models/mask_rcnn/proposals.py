"""RPN functional logic: target assignment, losses, proposal filtering.

Mirrors /root/reference/inst_model/Mask_RCNN/net/network_files/
rpn_function.py (RegionProposalNetwork :246-644) with static shapes:

* assign_targets_to_anchors (:365-418) -> Matcher(0.7, 0.3, low-quality
  recovery) over padded gt, per-anchor labels {1 pos, 0 neg, -1 discard};
* compute_loss (:531-573) -> 256-sample balanced BCE objectness +
  smooth-L1(beta=1/9) box loss;
* filter_proposals (:460-529) -> per-level top-k by objectness, decode,
  clip, small+score masks, per-level exact NMS (our MXU fixpoint NMS ==
  torchvision batched_nms with level ids), global top post_nms_top_n.

Everything is per-image; callers vmap over the batch.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from instancesegmentation_tpu.ops import boxes as box_ops
from instancesegmentation_tpu.ops import losses as L
from instancesegmentation_tpu.ops import matcher as match_ops
from instancesegmentation_tpu.ops import nms as nms_ops

RPN_FG_IOU = 0.7          # faster_rcnn_framework.py:264
RPN_BG_IOU = 0.3
RPN_BATCH = 256
RPN_POS_FRACTION = 0.5
RPN_NMS_THRESH = 0.7
SMOOTH_L1_BETA = 1.0 / 9  # rpn_function.py:560


class RPNTargets(NamedTuple):
    labels: jnp.ndarray        # (A,) 1 pos / 0 neg / -1 discard
    reg_targets: jnp.ndarray   # (A, 4)


def assign_targets_to_anchors(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                              gt_valid: jnp.ndarray) -> RPNTargets:
    """anchors (A,4) xyxy px; gt padded (G,4) px."""
    iou = box_ops.box_iou(gt_boxes, anchors)              # (G, A)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched = match_ops.match_rcnn(iou, gt_valid, RPN_FG_IOU, RPN_BG_IOU,
                                   allow_low_quality=True)
    labels = jnp.where(matched >= 0, 1, jnp.where(
        matched == match_ops.BELOW_LOW_THRESHOLD, 0, -1)).astype(jnp.int32)
    # one-hot matmul: a (A,) integer gather from (G, 4) lowers to a slow
    # per-element fusion on TPU (traced ~1.3 ms/step over 74k anchors).
    # HIGHEST precision: default-precision f32 matmuls run in bf16 on TPU
    # and would quantize the regression-target coordinates (see
    # ops/matcher.py).
    g = gt_boxes.shape[0]
    matched_gt = jnp.matmul(
        jax.nn.one_hot(jnp.maximum(matched, 0), g, dtype=gt_boxes.dtype),
        gt_boxes, precision=jax.lax.Precision.HIGHEST)
    reg_targets = box_ops.encode_rcnn(matched_gt, anchors, (1.0, 1.0, 1.0, 1.0))
    return RPNTargets(labels, reg_targets)


def rpn_loss(objectness: jnp.ndarray, pred_deltas: jnp.ndarray,
             targets: RPNTargets, rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(A,) logits, (A,4) deltas -> (objectness_loss, box_loss), one image
    (rpn_function.py:531-573)."""
    pos_mask, neg_mask = match_ops.balanced_sample(
        targets.labels, jnp.ones_like(targets.labels, bool),
        RPN_BATCH, RPN_POS_FRACTION, rng)
    sampled = pos_mask | neg_mask
    n_sampled = jnp.maximum(jnp.sum(sampled), 1)

    box_l = L.masked_sum(
        L.smooth_l1(pred_deltas, targets.reg_targets, SMOOTH_L1_BETA).sum(-1),
        pos_mask) / n_sampled
    obj_l = L.masked_sum(
        L.bce_with_logits(objectness, (targets.labels == 1).astype(jnp.float32)),
        sampled) / n_sampled
    return obj_l, box_l


class Proposals(NamedTuple):
    boxes: jnp.ndarray    # (P, 4) xyxy px
    scores: jnp.ndarray   # (P,) objectness logits
    valid: jnp.ndarray    # (P,) bool


def filter_proposals(deltas: jnp.ndarray, objectness: jnp.ndarray,
                     anchors: jnp.ndarray,
                     level_sizes: Sequence[int], image_hw: Tuple[int, int],
                     pre_nms_top_n: int, post_nms_top_n: int,
                     nms_thresh: float = RPN_NMS_THRESH,
                     min_size: float = 1e-3,
                     score_thresh: float = 0.0,
                     nms_top_n: int = 1000) -> Proposals:
    """One image. deltas (A,4) raw RPN regressions; objectness (A,) logits;
    anchors (A,4) px; level_sizes: anchors per FPN level (sum == A).

    Decode runs AFTER the per-level top-k (the reference decodes all A
    anchors first, rpn_function.py:486-494 — per-anchor decode commutes
    with top-k-by-objectness, so selecting first is identical at ~1/12 the
    decode work for 544^2's ~74k anchors).

    Deviation (documented): the fixpoint NMS runs on the top
    min(pre_nms_top_n, nms_top_n) candidates per level. The reference NMSes
    the full per-level top-2000 in training (rpn_function.py:601-644), but
    its cost here is an (N,N) IoU matrix times fixpoint iterations x 5
    levels; candidates ranked 1000-2000 virtually never survive both NMS
    0.7 and the global post-NMS top-k cut, and halving N quarters the
    matrix. Set nms_top_n=pre_nms_top_n for exact reference behavior."""
    kept_boxes, kept_scores, kept_valid = [], [], []
    start = 0
    for size in level_sizes:
        lvl_deltas = jax.lax.dynamic_slice_in_dim(deltas, start, size, 0)
        lvl_anchors = jax.lax.dynamic_slice_in_dim(anchors, start, size, 0)
        lvl_obj = jax.lax.dynamic_slice_in_dim(objectness, start, size, 0)
        start += size

        k = min(pre_nms_top_n, nms_top_n, size)
        top_obj, idx = jax.lax.top_k(lvl_obj, k)
        top_boxes = box_ops.decode_rcnn(lvl_deltas[idx], lvl_anchors[idx],
                                        (1.0, 1.0, 1.0, 1.0))
        top_boxes = box_ops.clip_boxes_to_image(top_boxes, image_hw)
        ok = box_ops.small_box_mask(top_boxes, min_size)
        ok &= jax.nn.sigmoid(top_obj) > score_thresh     # rpn_function.py:509
        keep = nms_ops.nms_mask(top_boxes, top_obj, nms_thresh, ok)
        kept_boxes.append(top_boxes)
        kept_scores.append(top_obj)
        kept_valid.append(keep)

    boxes = jnp.concatenate(kept_boxes)
    scores = jnp.concatenate(kept_scores)
    valid = jnp.concatenate(kept_valid)

    # global top post_nms_top_n among NMS survivors (rpn_function.py:525-527)
    masked = jnp.where(valid, scores, -jnp.inf)
    k = min(post_nms_top_n, boxes.shape[0])
    top_scores, idx = jax.lax.top_k(masked, k)
    return Proposals(boxes[idx], top_scores, top_scores > -jnp.inf)
