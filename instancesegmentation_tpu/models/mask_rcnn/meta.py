"""Mask R-CNN end-to-end train/infer functions (static shapes, one traced
XLA program each).

Assembles model.py's neural modules with proposals.py / roi_heads.py
functional logic, mirroring FasterRCNNBase.forward
(/root/reference/inst_model/Mask_RCNN/net/network_files/
faster_rcnn_framework.py:45-110) and MaskRCNN's mask branch
(mask_rcnn.py:97-211):

  backbone+FPN -> RPN head -> (train: rpn targets/loss) -> proposal
  filtering -> (train: sample 512 rois) -> 7x7 MultiScaleRoIAlign -> box
  head -> (train: fastrcnn loss | infer: postprocess) -> 14x14 RoIAlign on
  positives/detections -> mask head -> (train: mask loss | infer: probs)

Deviations (documented):
* fixed square input (cfg.input_shape) instead of the reference's
  min800/max1333 dynamic resize (transform.py:256-386) — XLA needs static
  shapes; the reference's own dataset already resizes to 544^2 before the
  network (inst_model/Mask_RCNN/utils/dataloader.py:197 via Augmentation).
* proposal counts are per-level constants; ragged keep-lists become
  validity masks.
* mask branch caps positives at MASK_ROIS_PER_IMAGE (512*0.25 = the
  sampler's own positive cap, so nothing is lost).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from instancesegmentation_tpu.models.mask_rcnn import proposals as P
from instancesegmentation_tpu.models.mask_rcnn import roi_heads as R
from instancesegmentation_tpu.ops.anchors import (fpn_feature_sizes,
                                                  rcnn_grid_anchors,
                                                  rcnn_level_sizes)
from instancesegmentation_tpu.ops.roi_align import \
    multiscale_roi_align_separable

PRE_NMS_TOPK_TRAIN = 2000     # faster_rcnn_framework.py:261
PRE_NMS_TOPK_TEST = 1000
POST_NMS_TOPK_TRAIN = 2000
POST_NMS_TOPK_TEST = 1000
MASK_ROIS_PER_IMAGE = 128     # = 512 * positive_fraction 0.25
ROI_SCALES = (0.25, 0.125, 0.0625, 0.03125)   # P2..P5


def _roi_backend() -> str:
    """RoIAlign implementation choice (INSTSEG_ROI_BACKEND overrides).

    'separable' (default): the one-hot jnp matmul form — under the
    model's vmap XLA batches its einsums to effective M = B*R*oh MXU
    rows and fuses the operator construction.
    'sorted': the level-sorted batched Pallas kernel
    (ops/pallas/roi_align_sorted.py) — each roi computed once at its own
    level, VMEM-resident backward accumulator. Wins STANDALONE (11.8 vs
    13.1 ms fwd+bwd, 544^2 b4 box-head shapes) but is a wash in the full
    train step (59.8 vs 59.4 ms/step with the small-R threshold; 69.6
    with every call sorted): the level padding (+rb slots/level) feeds
    12-60% more rois through the box/mask heads, and the standalone win
    is ~1.3 ms while surrounding-graph interaction costs eat it. Kept as
    a tested option; the A/B story lives in docs/PERF_NOTES.md round 3.
    'pallas': the round-2 per-level kernel (kept golden-tested)."""
    import os
    return os.environ.get("INSTSEG_ROI_BACKEND", "") or "separable"


def multiscale_roi_align(feats, rois, out_size, spatial_scales,
                         aligned=False):
    """Per-image MultiScaleRoIAlign dispatch (vmapped callers). The
    round-2 A/B: the jnp separable form beats the per-level Pallas kernel
    under vmap (544^2 b4 train 59.1 vs 69.7 ms/step; the kernel's
    per-block matmuls top out at ~42 MXU rows); gather forms are 2-8x
    slower still (row-gather ~26 GB/s). The batched level-sorted kernel
    (see _batched_roi_align) replaces this on the hot path."""
    if _roi_backend() == "pallas":
        from instancesegmentation_tpu.ops.pallas.roi_align import \
            multiscale_roi_align_pallas
        return multiscale_roi_align_pallas(feats, rois, out_size,
                                           spatial_scales, aligned=aligned)
    return multiscale_roi_align_separable(feats, rois, out_size,
                                          spatial_scales, aligned=aligned)


def _batched_roi_align(feats, rois, out_size, aligned, allow_xmajor=False):
    """Batched dispatch: returns (roi_feats (B, S', oh, ow, C), perm
    (B, S') or None, real (B, S') or None, xmajor: bool).

    ``allow_xmajor``: the caller's consumer contracts both spatial dims
    (the box head) and can take the sorted kernel's native (ow, oh) cell
    order, skipping a ~2 ms/call HBM un-transpose of the feature tensor
    at b8x1000 rois; when the returned ``xmajor`` is True the features
    are (B, S', ow, oh, C) and the consumer must swap its kernel axes
    (model.py:_FlattenDense spatial_swapped). Convolutional consumers
    (the mask head) must keep the default.

    With the 'sorted' backend, roi features come back in LEVEL-SORTED
    slot order (S' = Rpad >= S) and the caller must permute the per-roi
    SIDE DATA with ``jnp.take_along_axis(x, perm, axis=1)`` and AND its
    validity with ``real`` — the big feature tensor is never un-permuted
    (a row gather of it runs ~26 GB/s on this chip; permuting targets is
    free). Other backends return original order (perm is None).

    The sorted kernel only pays off for LARGE roi counts (the box head's
    512): its Rpad level padding (+rb per level) and per-block fixed
    costs are amortized over many rois. For the mask head's 128 rois the
    padding alone adds 25-60% slots of kernel+head compute — measured
    slower than the separable form there. Small-R calls therefore stay
    separable (threshold via INSTSEG_ROI_SORTED_MIN_R, default 256)."""
    import os
    r = rois.shape[1]
    min_r = int(os.environ.get("INSTSEG_ROI_SORTED_MIN_R", "256"))
    backend = _roi_backend()
    if os.environ.get("INSTSEG_ROI_BACKEND", "") == "":
        # Auto policy (no explicit backend requested): the sorted kernel
        # wins only when the TOTAL roi count amortizes its per-block and
        # level-padding costs — measured 69.5 -> 63.3 ms/call (-9%) on
        # the b8 inference graph (8x1000 rois), a wash at the train
        # step's 4x512, and a LOSS at b1x1000 (106.9 -> ~95 img/s: the
        # kernel's fixed costs dominate one image's pipeline). Gate on
        # batch*r >= 4096, real TPU only (interpret-mode Pallas would
        # crawl on the CPU test backend).
        import jax as _jax
        auto_total = int(os.environ.get("INSTSEG_ROI_SORTED_AUTO_TOTAL",
                                        "4096"))
        # symbolic batch dims (export --dynamic_batch) are not ints —
        # comparisons on them are undecidable, so auto stays separable
        # there (also the portable choice for a serialized artifact)
        if isinstance(rois.shape[0], int) and isinstance(r, int) and \
                rois.shape[0] * r >= auto_total and \
                _jax.default_backend() == "tpu":
            # keep the per-image min_r floor (default 256): at large
            # batches (b>=32) the mask head's ~100-roi call clears the
            # TOTAL gate, but the sorted kernel's level padding makes it
            # slower at small per-image R (round-3 measurements above) —
            # only the box head's large-R call should flip (round-4
            # advisor finding)
            backend = "sorted"
    if backend == "sorted" and r >= min_r:
        import jax as _jax
        from instancesegmentation_tpu.ops.pallas.roi_align_sorted import \
            multiscale_roi_align_sorted
        # P2..P5 only — P6 exists for the RPN, not RoIAlign (torchvision
        # featmap_names '0'-'3', faster_rcnn_framework.py:326-329); passing
        # it would add dead canvas rows and a 5th level ROI_SCALES lacks
        out = multiscale_roi_align_sorted(
            list(feats[:4]), rois, out_size, ROI_SCALES, aligned=aligned,
            rb=int(os.environ.get("INSTSEG_ROI_RB", "16")),
            interpret=_jax.default_backend() != "tpu",
            xmajor=allow_xmajor)
        return out.feats, out.perm, out.real, allow_xmajor

    def align_one(f2, f3, f4, f5, rr):
        return multiscale_roi_align((f2, f3, f4, f5), rr, out_size,
                                    ROI_SCALES, aligned=aligned)
    o = jax.vmap(align_one)(feats[0], feats[1], feats[2], feats[3], rois)
    return o, None, None, False


def _permute_side(t, perm, extra_dims=0):
    """take_along_axis on axis 1 with trailing broadcast dims."""
    idx = perm.reshape(perm.shape + (1,) * extra_dims)
    return jnp.take_along_axis(t, idx, axis=1)


@lru_cache(maxsize=None)
def _geometry_np(input_shape):
    fs = fpn_feature_sizes(tuple(input_shape))
    anchors = rcnn_grid_anchors(fs, tuple(input_shape))
    level_sizes = rcnn_level_sizes(fs)
    return anchors, level_sizes


def _geometry(input_shape):
    anchors, level_sizes = _geometry_np(tuple(int(s) for s in input_shape))
    return jnp.asarray(anchors), level_sizes


def make_mask_rcnn_train_fns(model, cfg, train: bool = True):
    """Returns loss_fn(params, batch_stats, batch, rng) ->
    (total, (loss_dict, new_stats)) for use inside a train step.
    ``train=False`` freezes BN stats (val-loss pass).

    Anchors/level geometry derive from the BATCH's static shape at trace
    time (not cfg.input_shape), so the same step function serves every
    resolution bucket (cfg.resolution_buckets) — jit retraces once per
    bucket shape, the torchvision-transform analogue of min800/max1333
    packing (transform.py:256-386) under XLA's static-shape rules."""
    aligned = bool(getattr(cfg, "roi_align_aligned", False))

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        images = batch["image"]
        b = images.shape[0]
        image_hw = tuple(int(s) for s in images.shape[1:3])
        anchors, level_sizes = _geometry(image_hw)

        feats, mutated = model.apply(
            variables, images, train, method="backbone_fpn",
            mutable=["batch_stats"] if train else [])
        if not train:
            mutated = {}
        objectness, deltas = model.apply(variables, feats, method="rpn")

        # gt in pixels
        scale = jnp.asarray([image_hw[1], image_hw[0]] * 2, jnp.float32)
        gt_boxes = batch["boxes"] * scale                    # (B, G, 4)
        gt_fg = batch["valid"] & ~batch["is_crowd"]

        # ---- RPN targets + loss (vmapped) -----------------------------
        rpn_t = jax.vmap(P.assign_targets_to_anchors, in_axes=(None, 0, 0))(
            anchors, gt_boxes, gt_fg)
        rng, r1, r2 = jax.random.split(rng, 3)
        obj_l, box_l = jax.vmap(P.rpn_loss)(
            objectness, deltas, rpn_t, jax.random.split(r1, b))
        loss_obj, loss_rpn_box = jnp.mean(obj_l), jnp.mean(box_l)

        # ---- proposals (detached, torchvision rpn_function.py:623) ----
        props = jax.vmap(partial(
            P.filter_proposals, level_sizes=level_sizes, image_hw=image_hw,
            pre_nms_top_n=PRE_NMS_TOPK_TRAIN,
            post_nms_top_n=POST_NMS_TOPK_TRAIN),
            in_axes=(0, 0, None))(
            jax.lax.stop_gradient(deltas),
            jax.lax.stop_gradient(objectness), anchors)

        # ---- sample rois (vmapped) ------------------------------------
        sampled = jax.vmap(R.select_training_samples)(
            props.boxes, props.valid, gt_boxes, batch["labels"], gt_fg,
            jax.random.split(r2, b))

        # ---- box head ---------------------------------------------------
        box_feats, perm, real, xmajor = _batched_roi_align(
            feats, sampled.rois, (7, 7), aligned,
            allow_xmajor=True)                           # (B, S', 7, 7, C)
        loss_sampled = sampled
        if perm is not None:
            # permute the small per-roi targets into slot order instead of
            # un-permuting the big roi features (see _batched_roi_align)
            loss_sampled = R.SampledRoIs(
                rois=_permute_side(sampled.rois, perm, 1),
                labels=_permute_side(sampled.labels, perm),
                reg_targets=_permute_side(sampled.reg_targets, perm, 1),
                matched_gt=_permute_side(sampled.matched_gt, perm),
                valid=_permute_side(sampled.valid, perm) & real)
        s = box_feats.shape[1]
        cls_logits, box_deltas = model.apply(
            variables, box_feats.reshape(b * s, 7, 7, -1), xmajor,
            method="box_forward")
        cls_logits = cls_logits.reshape(b, s, -1)
        box_deltas = box_deltas.reshape(b, s, -1, 4)

        cls_l, bx_l = jax.vmap(R.fastrcnn_loss)(cls_logits, box_deltas,
                                                loss_sampled)
        # torchvision reduces over the concatenated batch; our per-image
        # samplers emit equal counts, so the mean matches the global mean
        loss_cls, loss_box = jnp.mean(cls_l), jnp.mean(bx_l)

        # ---- mask branch -------------------------------------------------
        # positives picked from the ORIGINAL order (rng pairing identical
        # across roi-align backends)
        def pick_positives(smp, rng_i):
            pos = smp.valid & (smp.labels > 0)
            prio = jnp.where(pos, 1.0, 0.0) + jax.random.uniform(
                rng_i, pos.shape) * 0.5
            _, idx = jax.lax.top_k(prio, MASK_ROIS_PER_IMAGE)
            return (smp.rois[idx], smp.labels[idx], smp.matched_gt[idx],
                    pos[idx])
        rng, r3 = jax.random.split(rng)
        m_rois, m_labels, m_gt, m_valid = jax.vmap(pick_positives)(
            sampled, jax.random.split(r3, b))

        mask_feats, m_perm, m_real, _ = _batched_roi_align(
            feats, m_rois, (14, 14), aligned)
        if m_perm is not None:
            m_rois = _permute_side(m_rois, m_perm, 1)
            m_labels = _permute_side(m_labels, m_perm)
            m_gt = _permute_side(m_gt, m_perm)
            m_valid = _permute_side(m_valid, m_perm) & m_real
        mm = mask_feats.shape[1]
        mask_logits = model.apply(
            variables, mask_feats.reshape(b * mm, 14, 14, -1),
            method="mask_forward").reshape(b, mm, 28, 28, -1)

        mask_l = jax.vmap(partial(R.maskrcnn_loss, aligned=aligned))(
            mask_logits, m_rois, m_labels, m_gt, m_valid,
            batch["masks"].astype(jnp.float32))
        loss_mask = jnp.mean(mask_l)

        losses = {"loss_objectness": loss_obj,
                  "loss_rpn_box_reg": loss_rpn_box,
                  "loss_classifier": loss_cls,
                  "loss_box_reg": loss_box,
                  "loss_mask": loss_mask}
        total = sum(losses.values())       # fit_mask_rcnn sums the dict
        return total, (losses, mutated.get("batch_stats", batch_stats))

    return loss_fn


def make_mask_rcnn_infer_fn(model, cfg, max_det: int = 100,
                            score_thresh: float = R.SCORE_THRESH,
                            nms_thresh: float = R.NMS_THRESH):
    """variables, images -> per-image Detections + mask probs (28^2).

    Geometry follows the images' static shape (see make_mask_rcnn_train_fns)."""
    aligned = bool(getattr(cfg, "roi_align_aligned", False))
    num_candidates = int(getattr(cfg, "box_nms_candidates", 1024))

    def infer(variables, images):
        b = images.shape[0]
        image_hw = tuple(int(s) for s in images.shape[1:3])
        anchors, level_sizes = _geometry(image_hw)
        feats = model.apply(variables, images, False, method="backbone_fpn")
        objectness, deltas = model.apply(variables, feats, method="rpn")

        props = jax.vmap(partial(
            P.filter_proposals, level_sizes=level_sizes, image_hw=image_hw,
            pre_nms_top_n=PRE_NMS_TOPK_TEST,
            post_nms_top_n=POST_NMS_TOPK_TEST),
            in_axes=(0, 0, None))(deltas, objectness, anchors)

        box_feats, perm, real, xmajor = _batched_roi_align(
            feats, props.boxes, (7, 7), aligned, allow_xmajor=True)
        prop_boxes, prop_valid = props.boxes, props.valid
        if perm is not None:
            prop_boxes = _permute_side(prop_boxes, perm, 1)
            prop_valid = _permute_side(prop_valid, perm) & real
        s = box_feats.shape[1]
        cls_logits, box_deltas = model.apply(
            variables, box_feats.reshape(b * s, 7, 7, -1), xmajor,
            method="box_forward")
        cls_logits = cls_logits.reshape(b, s, -1)
        box_deltas = box_deltas.reshape(b, s, -1, 4)

        # detections are score-ranked, so the (permuted) roi order only
        # affects tie-breaks — the per-detection rows are self-contained
        dets = jax.vmap(partial(R.postprocess_detections, image_hw=image_hw,
                                score_thresh=score_thresh,
                                nms_thresh=nms_thresh, max_det=max_det,
                                num_candidates=num_candidates))(
            cls_logits, box_deltas, prop_boxes, prop_valid)

        mask_feats, m_perm, m_real, _ = _batched_roi_align(
            feats, dets.boxes, (14, 14), aligned)
        md = mask_feats.shape[1]
        mask_logits = model.apply(
            variables, mask_feats.reshape(b * md, 14, 14, -1),
            method="mask_forward").reshape(b, md, 28, 28, -1)
        # pick each detection's class channel (maskrcnn_inference,
        # roi_head.py:59-91) -> probs (B, D, 28, 28)
        if m_perm is None:
            labels_slot = dets.labels
        else:
            labels_slot = _permute_side(dets.labels, m_perm)
        picked = jnp.take_along_axis(
            mask_logits, labels_slot[:, :, None, None, None],
            axis=4)[..., 0]
        mask_probs = jax.nn.sigmoid(picked)
        if m_perm is not None:
            # un-permute the SMALL (B, D, 28, 28) prob maps back to
            # detection order: inv[d] = slot holding detection d (dummy
            # slots scatter out-of-bounds and are dropped)
            slot_idx = jnp.arange(m_perm.shape[1], dtype=jnp.int32)

            def invert(p, rl):
                return jnp.zeros((max_det,), jnp.int32).at[
                    jnp.where(rl, p, max_det)].set(slot_idx, mode="drop")
            inv = jax.vmap(invert)(m_perm, m_real)
            mask_probs = jnp.take_along_axis(
                mask_probs, inv[:, :, None, None], axis=1)
        return dets, mask_probs

    return infer
