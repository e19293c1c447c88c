#!/usr/bin/env python
"""Proto-resolution gt-oracle: the YOLACT mask-mAP ceiling at a given
prototype resolution.

For every gt instance, push its perfect binary mask through the lossy part
of the YOLACT mask path only — bilinear downsample to the prototype grid
(cfg.input_shape / divisor), binarize at 0.5, bilinear upsample back to
image resolution, binarize at 0.5 — and score the result as a detection
with the gt box and score 1.0 under the standard COCOeval protocol
(eval.py / data/eval_runner.py). The resulting mask mAP is the ceiling any
*binary* prototype grid of that resolution can reach; a trained model can
exceed it slightly because soft proto probabilities recover sub-pixel
edges (see BASELINE.md "overfit gap": trained 0.741 vs oracle 0.711 at
divisor 4 on the synthetic set).

Round-2 ran this as a throwaway /tmp script at divisor 4 (the paper's
input/4 protos, nets/yolact.py:70-93); this tool makes it reproducible and
adds ``--divisor 2`` for the opt-in cfg.proto_double mode.

Usage:
  PYTHONPATH=. python tools/proto_oracle.py --config yolact_synth \
      --split train --divisor 4
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="yolact_synth")
    p.add_argument("--divisor", type=int, default=4,
                   help="prototype grid = input_shape // divisor "
                        "(4 = paper, 2 = cfg.proto_double)")
    p.add_argument("--split", type=str, default="train",
                   choices=("val", "train"))
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--max_images", type=int, default=None)
    args = p.parse_args(argv)

    import cv2

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.data.datasets import (SegDataset,
                                                        get_annotation,
                                                        synthetic_annotation)
    from instancesegmentation_tpu.data.eval_runner import (MakeJson,
                                                           run_coco_eval)

    cfg = get_config(args.config,
                     **({"data_root": args.data_root} if args.data_root
                        else {}))
    ann = (synthetic_annotation(cfg.data_root) if cfg.exp_name == "shape"
           else get_annotation(cfg.exp_name, cfg.data_root,
                               list(cfg.class_names)))
    if args.split == "train":
        ds = SegDataset(ann.train_image_path, ann.train_coco, ann.label_map)
    else:
        ds = SegDataset(ann.val_image_path, ann.val_coco, ann.label_map)

    ph = max(1, cfg.input_shape[0] // args.divisor)
    pw = max(1, cfg.input_shape[1] // args.divisor)
    ids = ds.ids[:(args.max_images or cfg.eval_max_images)]
    mj = MakeJson(ann.label_map)
    n_inst = 0
    for image_id in ids:
        img = ds.coco.loadImgs(image_id)[0]
        h, w = img["height"], img["width"]
        for a in ds.coco.loadAnns(ds.coco.getAnnIds(imgIds=image_id)):
            if a.get("iscrowd", 0):
                continue
            gt = ds.coco.annToMask(a).astype(np.float32)
            # image res -> proto grid -> binarize -> back -> binarize,
            # exactly the trained path's resolution loss (predict.py
            # upsamples sigmoid(proto@coef) bilinearly then thresholds 0.5)
            small = cv2.resize(gt, (pw, ph), interpolation=cv2.INTER_LINEAR)
            small = (small > 0.5).astype(np.float32)
            up = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
            mask = up > 0.5
            x, y, bw, bh = a["bbox"]
            cls = ann.label_map[a["category_id"]] - 1     # 0-based contiguous
            mj.add_bbox(image_id, cls, (x, y, x + bw, y + bh), 1.0)
            mj.add_mask(image_id, cls, mask, 1.0)
            n_inst += 1

    with tempfile.TemporaryDirectory() as td:
        bbox_json, mask_json = mj.dump(td)
        bbox_stats, mask_stats = run_coco_eval(ds.coco, bbox_json, mask_json,
                                               img_ids=ids)
    print(f"\nproto grid {ph}x{pw} (input/{args.divisor}), "
          f"{len(ids)} images / {n_inst} instances")
    print(f"oracle bbox mAP: {bbox_stats[0]:.4f}  "
          f"mask mAP ceiling: {mask_stats[0]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
