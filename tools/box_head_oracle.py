#!/usr/bin/env python
"""Box-head oracle: feed GROUND-TRUTH boxes as proposals through a trained
Mask R-CNN box head and measure the post-regression IoU distribution.

Separates "RoIAlign grid limit" from "head/optimization limit" for the
memorization plateau (BASELINE.md round-2 analysis): the full pipeline's
residual is entirely IoU>=0.85 localization, so if the head FED PERFECT
PROPOSALS still cannot regress to IoU ~1 on memorized training data, the
ceiling is in the head's feature grid (7x7 RoIAlign at 20-53 px objects),
not in the RPN/proposal path upstream.

Protocol mirrors the reference's eval resize path (eval.py:62-96 protocol,
BaseTransform resize-only) on the TRAIN split of the memorization run:

  backbone+FPN -> RoIAlign(7x7) on the gt boxes -> box head ->
  decode the TRUE class's deltas vs the gt box -> IoU.

Prints one JSON line with the IoU distribution + classification accuracy.

Usage:
  python tools/box_head_oracle.py --config mask_rcnn_synth \
      --checkpoint output_noaug/mask_rcnn_synth/ckpt/best_epoch_weights \
      [--set roi_align_aligned=true] [--f32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="mask_rcnn_synth")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--split", default="train", choices=("train", "val"))
    ap.add_argument("--f32", action="store_true",
                    help="run the head in f32 (isolates bf16 rounding from "
                         "the grid limit)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from train import parse_set_overrides

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.data.augment import BaseTransform
    from instancesegmentation_tpu.data.datasets import (SegDataset,
                                                        get_annotation,
                                                        synthetic_annotation)
    from instancesegmentation_tpu.data.loader import RcnnCollate
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.mask_rcnn import roi_heads as R
    from instancesegmentation_tpu.models.mask_rcnn.meta import (ROI_SCALES,
                                                                multiscale_roi_align)
    from instancesegmentation_tpu.ops import boxes as box_ops
    from instancesegmentation_tpu.train.checkpoints import \
        load_inference_variables

    cfg = get_config(args.config)
    if args.set:
        cfg = cfg.replace(**parse_set_overrides(args.set, cfg))
    if args.f32:
        cfg = cfg.replace(mixed_precision=False)
    aligned = bool(cfg.roi_align_aligned)

    ann = (synthetic_annotation(cfg.data_root) if cfg.exp_name == "shape"
           else get_annotation(cfg.exp_name, cfg.data_root,
                               list(cfg.class_names)))
    img_path, coco = ((ann.train_image_path, ann.train_coco)
                      if args.split == "train"
                      else (ann.val_image_path, ann.val_coco))
    # bucketed configs (base800) trained keep-aspect; probe the head in
    # the same geometry (fit + pad into input_shape) rather than the
    # square stretch
    ds = SegDataset(img_path, coco, ann.label_map,
                    transform=BaseTransform(
                        cfg.input_shape,
                        keep_aspect=bool(cfg.resolution_buckets)))

    model = get_model(cfg, train_mode=False)
    variables = load_inference_variables(args.checkpoint)

    m = cfg.max_instances
    ih, iw = cfg.input_shape

    def oracle(variables, image, rois, labels):
        """image (1,H,W,3); rois (M,4) px (gt); labels (M,) 0-based.
        Returns (decoded true-class boxes (M,4), argmax class (M,))."""
        feats = model.apply(variables, image, False, method="backbone_fpn")
        f = [feats[i][0] for i in range(4)]
        box_feats = multiscale_roi_align(f, rois, (7, 7), ROI_SCALES,
                                         aligned=aligned)
        cls_logits, deltas = model.apply(
            variables, box_feats, method="box_forward")
        # decode the TRUE class channel (labels are 0-based; head channel
        # 0 is background)
        sel = jnp.take_along_axis(
            deltas.reshape(m, -1, 4), (labels + 1)[:, None, None], axis=1
        )[:, 0]
        decoded = box_ops.decode_rcnn(sel[:, None, :], rois[:, None, :],
                                      R.BOX_REG_WEIGHTS)[:, 0]
        decoded = box_ops.clip_boxes_to_image(decoded, (ih, iw))
        return decoded, jnp.argmax(cls_logits, -1)

    run = jax.jit(oracle)

    ious, cls_ok, sizes = [], [], []
    for i in range(len(ds)):
        rng = np.random.default_rng(0)
        s = ds.get_item(i, rng)
        # exact predictor preprocessing: yolact normalize + ImageNet
        # double-normalize quirk (RcnnCollate docstring)
        from instancesegmentation_tpu.data.augment import normalize_image
        x = normalize_image(s["image"])
        x = (x - RcnnCollate.IMAGENET_MEAN) / RcnnCollate.IMAGENET_STD
        n = min(len(s["labels"]), m)
        rois = np.zeros((m, 4), np.float32)
        labels = np.zeros((m,), np.int32)
        scale = np.array([iw, ih, iw, ih], np.float32)
        rois[:n] = s["boxes"][:n] * scale
        labels[:n] = s["labels"][:n]
        dec, cls = run(variables, x[None].astype(np.float32),
                       jnp.asarray(rois), jnp.asarray(labels))
        dec = np.asarray(dec)[:n]
        cls = np.asarray(cls)[:n]
        for j in range(n):
            a, b = dec[j], rois[j]
            x1, y1 = max(a[0], b[0]), max(a[1], b[1])
            x2, y2 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            area_a = (a[2] - a[0]) * (a[3] - a[1])
            area_b = (b[2] - b[0]) * (b[3] - b[1])
            ious.append(inter / max(area_a + area_b - inter, 1e-9))
            cls_ok.append(int(cls[j]) == int(labels[j]) + 1)
            sizes.append(float(np.sqrt(area_b)))

    ious = np.asarray(ious)
    # COCO-style implied ceiling: with perfect classification and one
    # detection per gt, AP@t ~= frac(IoU>=t); the memorization bbox mAP
    # ceiling the head grid permits is the mean over the 10 thresholds.
    thresholds = np.arange(0.5, 1.0, 0.05)
    implied = float(np.mean([(ious >= t).mean() for t in thresholds]))
    out = {
        "implied_bbox_map_ceiling": round(implied, 4),
        "config": cfg.name, "checkpoint": args.checkpoint,
        "split": args.split, "aligned": aligned,
        "dtype": "f32" if args.f32 else "bf16",
        "n_instances": int(ious.size),
        "iou_mean": round(float(ious.mean()), 4),
        "iou_median": round(float(np.median(ious)), 4),
        "iou_p10": round(float(np.percentile(ious, 10)), 4),
        "frac_ge_085": round(float((ious >= 0.85).mean()), 4),
        "frac_ge_090": round(float((ious >= 0.90).mean()), 4),
        "frac_ge_095": round(float((ious >= 0.95).mean()), 4),
        "cls_accuracy": round(float(np.mean(cls_ok)), 4),
        "mean_obj_size_px": round(float(np.mean(sizes)), 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
