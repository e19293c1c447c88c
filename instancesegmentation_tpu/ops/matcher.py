"""Anchor/proposal <-> ground-truth matching, static shapes.

The reference does matching with per-image ragged tensors and Python loops
(yolact: inst_model/yolact/nets/yolact_training.py:44-95 + per-image batch
loop :140-166; rcnn: .../net/network_files/det_utils.py:270-394). Here every
matcher is a pure function over PADDED gt arrays with validity masks, so a
whole batch is one ``jax.vmap`` — no host loops, no recompiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from instancesegmentation_tpu.ops import boxes as box_ops


class YolactMatch(NamedTuple):
    offsets: jnp.ndarray       # (A, 4) encoded regression targets
    conf: jnp.ndarray          # (A,) int32: 0 bg, -1 ignore, c>=1 class id
    matched_box: jnp.ndarray   # (A, 4) matched gt box (xyxy, normalized)
    matched_idx: jnp.ndarray   # (A,) int32 index into the gt arrays


def match_yolact(pos_thresh: float, neg_thresh: float,
                 gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                 gt_valid: jnp.ndarray, gt_is_crowd: jnp.ndarray,
                 anchors_cxcywh: jnp.ndarray,
                 crowd_iou_thresh: float = 0.7) -> YolactMatch:
    """Single-image YOLACT anchor matching (yolact_training.py:44-95).

    Args:
      gt_boxes: (G, 4) normalized xyxy, padded.
      gt_labels: (G,) int32 0-based class ids (padding value irrelevant).
      gt_valid: (G,) bool — real instances (crowd or not).
      gt_is_crowd: (G,) bool — crowd instances (matched only for ignoring).
      anchors_cxcywh: (A, 4).

    Semantics mirrored from the reference:
      * IoU of non-crowd gt vs point-form anchors; each anchor takes its
        best gt; each gt force-claims its best anchor (overlap pinned to 2,
        later gt wins on conflicts — the torch loop's last-write-wins is
        reproduced with a scatter-max over gt index).
      * conf = class+1; < pos_thresh -> -1 (ignore); < neg_thresh -> 0 (bg).
      * anchors with conf<=0 whose crowd-overlap (inter/area_anchor) > 0.7
        are ignored. NOTE: the reference computes crowd boxes from the
        wrong slice (yolact_training.py:152-155 re-slices an already
        truncated array); we implement the intended semantics (actual
        crowd entries) as SURVEY.md flags.
    """
    num_gt = gt_boxes.shape[0]
    fg = gt_valid & ~gt_is_crowd                       # (G,) foreground gt

    dec_anchors = box_ops.point_form(anchors_cxcywh)   # (A, 4)
    overlaps = box_ops.jaccard(gt_boxes, dec_anchors)  # (G, A)
    # Invalid / crowd gt rows must never win an argmax.
    overlaps = jnp.where(fg[:, None], overlaps, -1.0)

    each_box_idx = jnp.argmax(overlaps, axis=1)        # (G,) best anchor per gt
    anchor_max = jnp.max(overlaps, axis=0)             # (A,)
    anchor_idx = jnp.argmax(overlaps, axis=0)          # (A,)

    # Force-match: every fg gt claims its best anchor, UNCONDITIONALLY
    # overriding that anchor's own argmax gt (the torch loop writes
    # each_anchor_index[best_anchor[j]] = j; among several gts claiming
    # the same anchor the last — i.e. largest index — wins). Two-step
    # scatter: record force claims in a separate (-1)-initialized buffer
    # with scatter-max (largest j wins among claimants), then override.
    # A direct .at[idx].max(j) against anchor_idx would be WRONG: the
    # anchor's pre-existing argmax gt could be larger than the claimant.
    # Invalid gt rows scatter to index num_anchors — out of bounds for the
    # anchor-sized targets -> dropped. (NOT num_gt: that is a valid anchor
    # index whenever A > G.)
    num_anchors = anchors_cxcywh.shape[0]
    scatter_to = jnp.where(fg, each_box_idx, num_anchors)
    gt_ids = jnp.arange(num_gt, dtype=anchor_idx.dtype)
    forced = jnp.full((num_anchors,), -1, anchor_idx.dtype)
    forced = forced.at[scatter_to].max(gt_ids, mode="drop")
    anchor_max = jnp.where(forced >= 0, 2.0, anchor_max)
    anchor_idx = jnp.where(forced >= 0, forced, anchor_idx)

    # one-hot matmul instead of integer gathers: (A,) indices into (G, .)
    # lower to slow per-element gathers on TPU (traced ~1.2 ms/step).
    # Precision.HIGHEST is REQUIRED: TPU f32 matmuls at default precision
    # compute in bf16, which would quantize the selected box COORDINATES
    # (~2 px at 544) — i.e. noisy regression targets (measured: +8%% final
    # train loss and -0.06 val mAP on the synth set before the fix).
    sel = jax.nn.one_hot(anchor_idx, num_gt, dtype=jnp.float32)   # (A, G)
    matched_box = jnp.matmul(sel, gt_boxes,
                             precision=jax.lax.Precision.HIGHEST)  # (A, 4)
    conf = jnp.round(jnp.matmul(sel, gt_labels.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST)
                     ).astype(jnp.int32) + 1
    conf = jnp.where(anchor_max < pos_thresh, -1, conf)
    conf = jnp.where(anchor_max < neg_thresh, 0, conf)

    # Crowd suppression.
    crowd_boxes = jnp.where((gt_valid & gt_is_crowd)[:, None], gt_boxes, 0.0)
    crowd_ov = box_ops.jaccard(dec_anchors, crowd_boxes, iscrowd=True)  # (A, G)
    crowd_ov = jnp.where((gt_valid & gt_is_crowd)[None, :], crowd_ov, 0.0)
    best_crowd = jnp.max(crowd_ov, axis=1)
    conf = jnp.where((conf <= 0) & (best_crowd > crowd_iou_thresh), -1, conf)

    offsets = box_ops.encode_yolact(matched_box, anchors_cxcywh)
    return YolactMatch(offsets, conf, matched_box, anchor_idx.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Mask R-CNN Matcher (det_utils.py:270-394)
# ---------------------------------------------------------------------------

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_rcnn(match_quality: jnp.ndarray, gt_valid: jnp.ndarray,
               high_threshold: float, low_threshold: float,
               allow_low_quality: bool) -> jnp.ndarray:
    """Return per-anchor matched gt index, or -1 (below low) / -2 (between).

    match_quality: (G, A) IoU matrix; gt_valid: (G,) bool for padded rows.
    Mirrors det_utils.Matcher.__call__ + set_low_quality_matches_.
    """
    quality = jnp.where(gt_valid[:, None], match_quality, -1.0)
    matched_vals = jnp.max(quality, axis=0)            # (A,)
    matches = jnp.argmax(quality, axis=0).astype(jnp.int32)

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    out = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality:
        # For each gt, anchors tying its max quality are recovered to that gt
        # (det_utils.py:359-394). The reference uses the PRE-threshold argmax
        # row (all_matches), i.e. recovered anchors keep their own best gt.
        best_per_gt = jnp.max(quality, axis=1)         # (G,)
        ties = (quality == best_per_gt[:, None]) & gt_valid[:, None] \
            & (best_per_gt[:, None] > -1.0)
        recover = jnp.any(ties, axis=0)                # (A,)
        out = jnp.where(recover, matches, out)
    return out


def balanced_sample(labels: jnp.ndarray, valid: jnp.ndarray,
                    num_samples: int, positive_fraction: float,
                    rng: jax.Array):
    """BalancedPositiveNegativeSampler (det_utils.py:7-84), static shapes.

    labels: (A,) int32 where 1 = positive, 0 = negative, -1 = discard.
    Returns (pos_mask, neg_mask): boolean (A,) masks with at most
    num_pos = min(#pos, num_samples*fraction) positives selected uniformly
    at random, and num_neg = min(#neg, num_samples - num_pos) negatives.

    Implemented as random-priority top-k (the TPU-static equivalent of
    ``randperm[:k]``).
    """
    a = labels.shape[0]
    k_pos_cap = int(num_samples * positive_fraction)
    rng_p, rng_n = jax.random.split(rng)

    is_pos = (labels == 1) & valid
    is_neg = (labels == 0) & valid
    num_pos = jnp.minimum(jnp.sum(is_pos), k_pos_cap)
    num_neg = jnp.minimum(jnp.sum(is_neg), num_samples - num_pos)

    def topk_mask(mask, rng, k_take, k_cap):
        prio = jnp.where(mask, jax.random.uniform(rng, (a,)), -1.0)
        _, idx = jax.lax.top_k(prio, min(k_cap, a))
        rank_ok = jnp.arange(min(k_cap, a)) < k_take
        out = jnp.zeros((a,), bool).at[idx].set(rank_ok, mode="drop")
        return out & mask

    pos_mask = topk_mask(is_pos, rng_p, num_pos, k_pos_cap)
    neg_mask = topk_mask(is_neg, rng_n, num_neg, num_samples)
    return pos_mask, neg_mask
