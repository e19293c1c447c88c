"""Non-maximum suppression, TPU-native (static shapes, no host sync).

* ``fast_nms`` — YOLACT's matrix-form Fast-NMS
  (/root/reference/inst_model/yolact/utils/utils_bbox.py:50-100). Already a
  dense upper-triangular-IoU algorithm, so it maps 1:1 onto the MXU/VPU.
* ``nms_mask`` — exact sequential NMS (torchvision.ops.nms semantics,
  .../Mask_RCNN/net/network_files/boxes.py:7-34) expressed as a
  fixed-iteration ``lax.fori_loop`` over score-sorted candidates.
* ``batched_nms_mask`` — per-category NMS via the coordinate-offset trick
  (boxes.py:37-83).

Dynamic "keep lists" become boolean masks + top-k gathers; downstream code
carries validity masks instead of ragged tensors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from instancesegmentation_tpu.ops import boxes as box_ops


class FastNMSOut(NamedTuple):
    boxes: jnp.ndarray     # (max_det, 4)
    scores: jnp.ndarray    # (max_det,)  0 where slot invalid
    classes: jnp.ndarray   # (max_det,) int32
    coefs: jnp.ndarray     # (max_det, coef_dim)
    valid: jnp.ndarray     # (max_det,) bool


def fast_nms(boxes: jnp.ndarray, scores: jnp.ndarray, coefs: jnp.ndarray,
             score_thresh: float, iou_thresh: float,
             top_k: int = 200, max_detections: int = 100) -> FastNMSOut:
    """YOLACT Fast-NMS over one image.

    Args:
      boxes: (A, 4) decoded xyxy (normalized).
      scores: (A, C) per-class scores, background already stripped.
      coefs: (A, K) mask coefficients.

    The reference first drops anchors whose max class score <= score_thresh,
    then per-class sorts. We keep shapes static by zeroing failing anchors'
    scores instead — identical results because the reference re-filters by
    ``score > confidence`` after NMS (utils_bbox.py:208-212), which we fold
    into ``valid``.
    """
    a, c = scores.shape
    keep_anchor = jnp.max(scores, axis=1) > score_thresh          # (A,)
    cls_scores = jnp.where(keep_anchor[:, None], scores, 0.0).T   # (C, A)

    k = min(top_k, a)
    top_scores, idx = jax.lax.top_k(cls_scores, k)                # (C, k)
    top_boxes = boxes[idx.reshape(-1)].reshape(c, k, 4)
    top_coefs = coefs[idx.reshape(-1)].reshape(c, k, -1)

    iou = box_ops.jaccard(top_boxes, top_boxes)                   # (C, k, k)
    iou = jnp.triu(iou, k=1)
    iou_max = jnp.max(iou, axis=1)                                # (C, k)
    keep = (iou_max <= iou_thresh) & (top_scores > score_thresh)

    flat_scores = jnp.where(keep, top_scores, 0.0).reshape(-1)    # (C*k,)
    m = min(max_detections, c * k)
    final_scores, flat_idx = jax.lax.top_k(flat_scores, m)
    final_boxes = top_boxes.reshape(-1, 4)[flat_idx]
    final_coefs = top_coefs.reshape(c * k, -1)[flat_idx]
    final_classes = (flat_idx // k).astype(jnp.int32)
    valid = final_scores > score_thresh
    return FastNMSOut(final_boxes, final_scores, final_classes, final_coefs, valid)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_thresh: float, valid: jnp.ndarray | None = None,
             block: int = 128) -> jnp.ndarray:
    """Exact greedy NMS -> boolean keep mask (same order as input).

    Matches torchvision.ops.nms: a box survives iff no higher-scored
    SURVIVING box overlaps it above iou_thresh. Replaces the reference's
    sequential C++ loop (torchvision nms, boxes.py:7-34) with forms XLA
    can pipeline on the MXU:

    * n <= block: Jacobi fixpoint on the score-ordered suppression DAG,
        keep_j <- valid_j & ~any_i<j (keep_i & iou_ij > thr)
      exact greedy in at most chain-depth iterations (typically < 20),
      each an (N,N) @ (N,) product.
    * n > block: block-sequential Gauss-Seidel — decide ``block`` boxes
      at a time in score order. Each scan step computes one (N, B) IoU
      slab on the fly (the full (N,N) matrix is never materialized: the
      pure-Jacobi form re-read an HBM-resident N^2 matrix once per
      fixpoint iteration — ~14 passes over 320 MB for the Mask R-CNN
      postprocess at b8, measured 17 ms of the 74 ms inference call),
      one cross matvec against the already-decided keeps, and a small
      within-block fixpoint on the (B, B) diagonal. Identical greedy
      semantics: suppression only flows from higher-scored boxes, so
      deciding blocks in score order with earlier keeps frozen is exact.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    if valid is None:
        valid = jnp.ones((n,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sboxes = boxes[order]
    svalid = valid[order]

    if n <= block:
        iou = box_ops.box_iou(sboxes, sboxes)                      # (N, N)
        # suppress[i, j]: higher-ranked i knocks out j (strict upper-tri)
        suppress = jnp.triu(iou > iou_thresh, k=1).astype(jnp.float32)

        def cond(carry):
            keep, prev_keep, it = carry
            return (it < n) & jnp.any(keep != prev_keep)

        def body(carry):
            keep, _, it = carry
            hit = suppress.T @ keep.astype(jnp.float32)            # (N,)
            new_keep = svalid & (hit < 0.5)
            return new_keep, keep, it + 1

        keep0 = svalid
        keep_sorted, _, _ = jax.lax.while_loop(
            cond, body, (keep0, jnp.zeros_like(keep0), 0))
        return jnp.zeros((n,), bool).at[order].set(keep_sorted)

    # ---- blocked path ----------------------------------------------
    nb = -(-n // block)
    pad = nb * block - n
    sboxes_p = jnp.pad(sboxes, ((0, pad), (0, 0)))
    svalid_p = jnp.pad(svalid, (0, pad))          # padded slots invalid

    def step(keep_f, b):
        start = b * block
        bboxes = jax.lax.dynamic_slice(sboxes_p, (start, 0), (block, 4))
        bvalid = jax.lax.dynamic_slice(svalid_p, (start,), (block,))
        slab = box_ops.box_iou(sboxes_p, bboxes)                  # (N, B)
        sup = (slab > iou_thresh).astype(jnp.float32)
        # cross-suppression from already-decided boxes: keep_f is zero at
        # and after this block, so no index masking is needed
        hit_prev = keep_f @ sup                                    # (B,)
        # strict upper triangle of this block's diagonal
        d = jax.lax.dynamic_slice(sup, (start, 0), (block, block))
        d = d * jnp.triu(jnp.ones((block, block), jnp.float32), k=1)

        def cond(c):
            kb, prev, it = c
            return (it < block) & jnp.any(kb != prev)

        def body(c):
            kb, _, it = c
            hit = hit_prev + d.T @ kb.astype(jnp.float32)
            return bvalid & (hit < 0.5), kb, it + 1

        kb0 = bvalid & (hit_prev < 0.5)
        kb, _, _ = jax.lax.while_loop(
            cond, body, (kb0, jnp.zeros_like(kb0), 0))
        keep_f = jax.lax.dynamic_update_slice(
            keep_f, kb.astype(jnp.float32), (start,))
        return keep_f, None

    keep_f, _ = jax.lax.scan(step, jnp.zeros((nb * block,), jnp.float32),
                             jnp.arange(nb))
    keep_sorted = keep_f[:n] > 0.5
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                     idxs: jnp.ndarray, iou_thresh: float,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Category-aware NMS via coordinate offsets (boxes.py:37-83)."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), bool)
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    return nms_mask(boxes + offsets[:, None], scores, iou_thresh, valid)


def traditional_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                    coefs: jnp.ndarray, score_thresh: float,
                    iou_thresh: float, pre_top_k: int = 1000,
                    max_detections: int = 100) -> FastNMSOut:
    """YOLACT's 'traditional' per-class exact NMS
    (utils_bbox.py:102-140): each anchor belongs to its argmax class, exact
    greedy NMS per class on the max-class score, global top
    max_detections. Static-shape version: pre-filter to the pre_top_k
    highest max-scores, then one vmapped fixpoint NMS per class.
    """
    a, c = scores.shape
    max_score = jnp.max(scores, axis=1)
    arg_class = jnp.argmax(scores, axis=1).astype(jnp.int32)
    keep_anchor = max_score > score_thresh

    k = min(pre_top_k, a)
    top_scores, idx = jax.lax.top_k(jnp.where(keep_anchor, max_score, 0.0), k)
    top_boxes = boxes[idx]
    top_coefs = coefs[idx]
    top_class = arg_class[idx]
    top_valid = top_scores > score_thresh

    def per_class(cls):
        v = top_valid & (top_class == cls)
        return nms_mask(top_boxes, top_scores, iou_thresh, v)
    keep = jax.vmap(per_class)(jnp.arange(c)).any(axis=0)    # (k,)

    masked = jnp.where(keep, top_scores, 0.0)
    m = min(max_detections, k)
    final_scores, fidx = jax.lax.top_k(masked, m)
    return FastNMSOut(top_boxes[fidx], final_scores, top_class[fidx],
                      top_coefs[fidx], final_scores > score_thresh)


def topk_by_mask(scores: jnp.ndarray, keep: jnp.ndarray, k: int):
    """Select the k highest-scoring kept entries.

    Returns (indices (k,), valid (k,)) — the static-shape idiom replacing
    the reference's ``boxes[keep][:k]`` dynamic gathers.
    """
    masked = jnp.where(keep, scores, -jnp.inf)
    top, idx = jax.lax.top_k(masked, min(k, scores.shape[0]))
    return idx, top > -jnp.inf
