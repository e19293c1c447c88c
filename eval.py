#!/usr/bin/env python
"""COCO mAP evaluation CLI.

Mirrors /root/reference/eval.py: loads the config's val set, runs the
predictor over the first ``--max_images`` ids (default 100, eval.py:62)
with eval thresholds confidence=0.05 / NMS IoU=0.5 (:67-68), writes
bbox_detections.json + mask_detections.json, and summarizes COCOeval for
bbox and segm.

map_mode (eval.py:31-37): 0 = predict + metrics, 1 = predict only,
2 = metrics only (reuse existing jsons).
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")  # silence XLA AOT-cache spam


import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="yolact_base")
    p.add_argument("--map_mode", type=int, default=0, choices=(0, 1, 2))
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--out_root", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax state dir (default <out>/ckpt/best_epoch_weights)")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--split", type=str, default="val", choices=("val", "train"),
                   help="which split to score; 'train' is the overfit/"
                        "memorization probe (not part of the reference "
                        "protocol, which always scores val)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="override any Config field (repeatable); must match "
                        "the overrides the checkpoint was trained with")
    args = p.parse_args(argv)

    from train import parse_set_overrides

    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.data.datasets import (SegDataset,
                                                        get_annotation,
                                                        synthetic_annotation)
    from instancesegmentation_tpu.data.eval_runner import evaluate_predictor
    from instancesegmentation_tpu.models import get_predictor

    overrides = {k: v for k, v in (("data_root", args.data_root),
                                   ("out_root", args.out_root)) if v}
    cfg = get_config(args.config, **overrides)
    if args.set:
        cfg = cfg.replace(**parse_set_overrides(args.set, cfg))
    out_dir = os.path.join(cfg.out_root, cfg.name)

    ann = (synthetic_annotation(cfg.data_root) if cfg.exp_name == "shape"
           else get_annotation(cfg.exp_name, cfg.data_root,
                               list(cfg.class_names)))
    if args.split == "train":
        val_ds = SegDataset(ann.train_image_path, ann.train_coco,
                            ann.label_map)
    else:
        val_ds = SegDataset(ann.val_image_path, ann.val_coco, ann.label_map)

    predictor = None
    if args.map_mode in (0, 1):
        ckpt = args.checkpoint or os.path.join(out_dir, "ckpt",
                                               "best_epoch_weights")
        predictor = get_predictor(
            cfg, checkpoint=ckpt,
            confidence=cfg.eval_confidence, nms_iou=cfg.eval_nms_iou)

    stats = evaluate_predictor(
        predictor, val_ds, ann.label_map, out_dir,
        max_images=args.max_images or cfg.eval_max_images,
        map_mode=args.map_mode)
    if stats is not None:
        bbox_stats, mask_stats = stats
        print(f"\nbbox mAP: {bbox_stats[0]:.4f}  mask mAP: {mask_stats[0]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
