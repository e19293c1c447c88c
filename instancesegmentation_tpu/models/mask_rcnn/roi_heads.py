"""RoI heads functional logic: training-sample selection, box/mask losses,
detection post-processing.

Mirrors /root/reference/inst_model/Mask_RCNN/net/network_files/roi_head.py
with static shapes:

* select_training_samples (:281-364): gt appended to proposals,
  Matcher(0.5, 0.5, no low-quality), 512-sample @ 25% positives,
  BoxCoder weights (10, 10, 5, 5);
* fastrcnn_loss (:12-56): CE over sampled + smooth-L1 with beta=1/9 (the
  reference box head passes beta=1/9 explicitly, roi_head.py:52, same as
  its RPN) summed over positive rows / num sampled;
* maskrcnn_loss (:94-146): gt masks projected onto positive rois with
  28x28 roi_align, BCE against the gt-class mask channel;
* postprocess_detections (:366-457): per-class decode, clip, score 0.05,
  remove-small 0.01, per-class NMS 0.5 (vmapped fixpoint NMS == the
  reference's batched_nms), top 100.

Everything is per-image; callers vmap over the batch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from instancesegmentation_tpu.ops import boxes as box_ops
from instancesegmentation_tpu.ops import losses as L
from instancesegmentation_tpu.ops import matcher as match_ops
from instancesegmentation_tpu.ops import nms as nms_ops
from instancesegmentation_tpu.ops import roi_align as ra

BOX_FG_IOU = 0.5                 # faster_rcnn_framework.py:271
BOX_BG_IOU = 0.5
BOX_BATCH = 512
BOX_POS_FRACTION = 0.25
BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
SCORE_THRESH = 0.05
NMS_THRESH = 0.5
DETECTIONS_PER_IMG = 100
MIN_BOX_SIZE = 0.01              # boxes.py remove_small via roi_head.py:420


class SampledRoIs(NamedTuple):
    rois: jnp.ndarray           # (S, 4) xyxy px
    labels: jnp.ndarray         # (S,) 0 bg, 1..K fg
    reg_targets: jnp.ndarray    # (S, 4)
    matched_gt: jnp.ndarray     # (S,) gt index for mask targets
    valid: jnp.ndarray          # (S,) bool


def select_training_samples(proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                            gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                            gt_valid: jnp.ndarray, rng: jax.Array,
                            num_samples: int = BOX_BATCH) -> SampledRoIs:
    """One image. proposals (P,4) px; gt padded (G,·); labels 0-based."""
    # append gt to proposals (roi_head.py:293-297)
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = box_ops.box_iou(gt_boxes, all_boxes)             # (G, P+G)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    iou = jnp.where(all_valid[None, :], iou, -1.0)
    matched = match_ops.match_rcnn(iou, gt_valid, BOX_FG_IOU, BOX_BG_IOU,
                                   allow_low_quality=False)

    labels = jnp.where(matched >= 0,
                       gt_labels[jnp.maximum(matched, 0)] + 1, 0)
    labels = jnp.where(matched == match_ops.BETWEEN_THRESHOLDS, -1, labels)
    labels = jnp.where(all_valid, labels, -1).astype(jnp.int32)

    sample_labels = jnp.where(labels > 0, 1, jnp.where(labels == 0, 0, -1))
    rng_sample, rng_tie = jax.random.split(rng)
    pos_mask, neg_mask = match_ops.balanced_sample(
        sample_labels, all_valid, num_samples, BOX_POS_FRACTION, rng_sample)
    chosen = pos_mask | neg_mask

    # gather a FIXED num_samples set: positives first (highest priority),
    # then negatives; unfilled slots invalid
    prio = jnp.where(pos_mask, 2.0, jnp.where(neg_mask, 1.0, 0.0))
    prio += jax.random.uniform(rng_tie, prio.shape) * 0.5  # break ties randomly
    _, idx = jax.lax.top_k(prio, num_samples)
    sel_valid = chosen[idx]

    rois = all_boxes[idx]
    sel_labels = jnp.where(sel_valid, labels[idx], 0)
    sel_matched = jnp.maximum(matched[idx], 0)
    # one-hot matmul instead of gt_boxes[sel_matched] (slow TPU gather);
    # HIGHEST precision so the selected coordinates are not bf16-rounded
    # (see ops/matcher.py)
    sel_gt = jnp.matmul(
        jax.nn.one_hot(sel_matched, gt_boxes.shape[0], dtype=gt_boxes.dtype),
        gt_boxes, precision=jax.lax.Precision.HIGHEST)
    reg_targets = box_ops.encode_rcnn(sel_gt, rois, BOX_REG_WEIGHTS)
    return SampledRoIs(rois, sel_labels, reg_targets, sel_matched, sel_valid)


def fastrcnn_loss(class_logits: jnp.ndarray, box_deltas: jnp.ndarray,
                  sampled: SampledRoIs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """class_logits (S,K), box_deltas (S,K,4) -> (cls_loss, box_loss)
    (roi_head.py:12-56)."""
    n = jnp.maximum(jnp.sum(sampled.valid), 1)
    ce = L.softmax_cross_entropy(class_logits, sampled.labels)
    cls_loss = L.masked_sum(ce, sampled.valid) / n         # CE mean

    pos = sampled.valid & (sampled.labels > 0)
    pred = jnp.take_along_axis(
        box_deltas, sampled.labels[:, None, None].clip(0), axis=1)[:, 0]
    box_loss = L.masked_sum(
        L.smooth_l1(pred, sampled.reg_targets, beta=1.0 / 9).sum(-1),
        pos) / n
    return cls_loss, box_loss


def maskrcnn_loss(mask_logits: jnp.ndarray, mask_rois: jnp.ndarray,
                  roi_labels: jnp.ndarray, roi_gt_idx: jnp.ndarray,
                  roi_valid: jnp.ndarray, gt_masks: jnp.ndarray,
                  aligned: bool = False) -> jnp.ndarray:
    """mask_logits (M, 28, 28, K); mask_rois (M,4) px; gt_masks (G, H, W)
    uint8 at image resolution (roi_head.py:94-146)."""
    m, oh, ow, _ = mask_logits.shape
    # project gt masks onto rois at 28x28 (project_masks_on_boxes: roi_align
    # with spatial_scale=1 on the matched instance's mask), exactly the
    # separable-matmul roi_align with the gt selection as a one-hot matmul
    # (a vmapped integer gather of gt_masks[idx] lowers to a sequential
    # dynamic-slice loop, ~2.5 ms/step traced). The contraction ORDER is
    # picked by intermediate size: selecting first materializes (M, H, W),
    # pooling first materializes (M, G, oh, W) — the latter only wins when
    # G*oh < H (small instance budgets / large images); at e.g. G=48,
    # 544^2 it would be ~374 MB f32 per image and OOM under vmap+backward.
    # Both orders are numerically identical to gathering: the one-hot
    # selection of BINARY masks is exact in any dtype (bf16 halves the
    # intermediate's HBM traffic; the pooling matmuls stay f32/HIGHEST).
    g = gt_masks.shape[0]
    hh, ww = gt_masks.shape[1], gt_masks.shape[2]
    roi = mask_rois.astype(jnp.float32) - (0.5 if aligned else 0.0)
    x1, y1 = roi[:, 0], roi[:, 1]
    rw, rh = roi[:, 2] - roi[:, 0], roi[:, 3] - roi[:, 1]
    if not aligned:
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    # sampling_ratio=-1: torchvision's ADAPTIVE grid — the reference's
    # project_masks_on_boxes calls roi_align with the default sampling
    # ratio (roi_head.py:106), i.e. ceil(roi/28) samples per bin, so a
    # large roi projects from its full extent rather than a 2x2 subsample
    # (closes docs/COMPONENTS.md deviation 3; feature pooling stays at 2
    # per faster_rcnn_framework.py:329)
    by = ra._interp_pool_matrix(y1, rh / oh, hh, oh, -1, jnp.float32)
    bx = ra._interp_pool_matrix(x1, rw / ow, ww, ow, -1, jnp.float32)
    # HIGHEST precision: these produce TRAINING TARGETS; default-precision
    # f32 einsums run in bf16 on TPU (torchvision computes this in f32)
    hi = jax.lax.Precision.HIGHEST
    if g * oh >= hh:
        # select-first: (M, H, W) intermediate; exact one-hot pick of
        # binary masks in bf16 (0/1 representable), then f32 pooling
        sel = jax.nn.one_hot(roi_gt_idx, g, dtype=jnp.bfloat16)
        sel_masks = jnp.einsum("mg,ghw->mhw", sel,
                               gt_masks.astype(jnp.bfloat16))  # (M, H, W)
        t = jnp.einsum("myh,mhw->myw", by,
                       sel_masks.astype(jnp.float32), precision=hi)
    else:
        sel = jax.nn.one_hot(roi_gt_idx, g, dtype=jnp.float32)   # (M, G)
        t = jnp.einsum("myh,ghw->mgyw", by, gt_masks.astype(jnp.float32),
                       precision=hi)
        t = jnp.einsum("mgyw,mg->myw", t, sel, precision=hi)   # (M, oh, W)
    targets = jnp.einsum("myw,mxw->myx", t, bx, precision=hi)  # (M, 28, 28)

    picked = jnp.take_along_axis(
        mask_logits, roi_labels[:, None, None, None].clip(0), axis=3)[..., 0]
    bce = L.bce_with_logits(picked, targets)
    per_roi = bce.mean(axis=(1, 2))
    n = jnp.maximum(jnp.sum(roi_valid), 1)
    return L.masked_sum(per_roi, roi_valid) / n


class Detections(NamedTuple):
    boxes: jnp.ndarray     # (D, 4) px
    scores: jnp.ndarray    # (D,)
    labels: jnp.ndarray    # (D,) 1..K
    valid: jnp.ndarray     # (D,)
    # count of above-threshold (proposal, class) candidates BEFORE the
    # static num_candidates pool — the pool is provably equivalent to
    # torchvision's score-filter-then-batched-NMS only while every such
    # candidate fits (round-4 deviation, docs/COMPONENTS.md); this makes
    # saturation observable at eval time instead of silent
    n_candidates: jnp.ndarray = None


def postprocess_detections(class_logits: jnp.ndarray, box_deltas: jnp.ndarray,
                           proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                           image_hw, score_thresh: float = SCORE_THRESH,
                           nms_thresh: float = NMS_THRESH,
                           max_det: int = DETECTIONS_PER_IMG,
                           num_candidates: int = 1024) -> Detections:
    """One image (roi_head.py:366-457).

    ``num_candidates > 0`` (default) is the reference's own algorithm:
    torchvision filters candidates by score and runs ONE ``batched_nms``
    over every class jointly, isolating classes by coordinate offsets
    (roi_head.py:441-445 -> boxes.py:37-83). The static-shape form pools
    the ``num_candidates`` highest-scored (proposal, class) pairs and
    offset-NMSes that pool — one blocked exact NMS over N candidates
    instead of K-1 vmapped NMS lanes over all P proposals each (the
    per-class form computed ~20x the IoU work on this head's shapes; it
    was 14 ms of the 57 ms b8 544^2 inference call, see PERF_NOTES).
    Equivalent to the per-class form whenever every candidate above
    score_thresh fits the pool OR >= max_det pool survivors outrank every
    excluded candidate — 10x headroom at the defaults (1024 pooled for a
    100-detection output, same spirit as the RPN's own pre/post-NMS top-k
    caps, faster_rcnn_framework.py:257-264). ``num_candidates=0`` keeps
    the exhaustive per-class form (property tests A/B the two).
    """
    k = class_logits.shape[-1]
    probs = jax.nn.softmax(class_logits, axis=-1)          # (P, K)
    boxes = box_ops.decode_rcnn(box_deltas, proposals[:, None, :],
                                BOX_REG_WEIGHTS)           # (P, K, 4)
    boxes = box_ops.clip_boxes_to_image(boxes, image_hw)

    # drop background column
    fg_boxes = boxes[:, 1:]                                # (P, K-1, 4)
    fg_probs = probs[:, 1:]

    ok = (fg_probs > score_thresh) & prop_valid[:, None]
    ok &= box_ops.small_box_mask(fg_boxes, MIN_BOX_SIZE)
    n_above = jnp.sum(ok).astype(jnp.int32)

    if num_candidates:
        flat = jnp.where(ok, fg_probs, 0.0).reshape(-1)    # (P*(K-1),)
        n = min(num_candidates, flat.shape[0])
        cs, idx = jax.lax.top_k(flat, n)                   # score-sorted pool
        cb = fg_boxes.reshape(-1, 4)[idx]                  # (N, 4)
        cl = (idx % (k - 1)).astype(jnp.int32)             # 0-based fg class
        keep = nms_ops.batched_nms_mask(cb, cs, cl, nms_thresh, cs > 0.0)
        d = min(max_det, n)
        top, fidx = jax.lax.top_k(jnp.where(keep, cs, 0.0), d)
        return Detections(cb[fidx], top, cl[fidx] + 1, top > score_thresh,
                          n_above)

    # exhaustive per-class exact NMS, vmapped over classes
    def per_class(b, s, v):
        return nms_ops.nms_mask(b, s, nms_thresh, v)
    keep = jax.vmap(per_class, in_axes=(1, 1, 1), out_axes=1)(
        fg_boxes, fg_probs, ok)                            # (P, K-1)

    flat_scores = jnp.where(keep, fg_probs, 0.0).reshape(-1)
    d = min(max_det, flat_scores.shape[0])
    top, idx = jax.lax.top_k(flat_scores, d)
    det_boxes = fg_boxes.reshape(-1, 4)[idx]
    det_labels = (idx % (k - 1)).astype(jnp.int32) + 1
    return Detections(det_boxes, top, det_labels, top > score_thresh, n_above)
