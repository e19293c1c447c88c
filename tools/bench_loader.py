#!/usr/bin/env python
"""Host data-pipeline throughput: can the loader feed the TPU step?

Measures images/sec of the full host path — image decode + augmentation
(or resize-only) + fixed-shape collate + threaded prefetch — for a given
config, and compares against the measured device step throughput so the
input pipeline's headroom is a number, not a hope. Runs entirely on the
host (no accelerator needed):

  PYTHONPATH= JAX_PLATFORMS=cpu python tools/bench_loader.py \
      --config yolact_synth --set input_shape=(544,544) --batch 8

The reference's equivalent is torch DataLoader worker processes
(models/init_model.py:127-136); here a thread pool decodes/augments
(cv2/numpy release the GIL for the heavy parts, data/loader.py:102-108).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="yolact_synth")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num_workers", type=int, default=None,
                    help="override cfg.num_workers")
    ap.add_argument("--epochs", type=int, default=6,
                    help="epochs to iterate (first is warmup; >= 2)")
    ap.add_argument("--no_augment", action="store_true")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    dest="overrides")
    args = ap.parse_args()
    if args.epochs < 2:
        ap.error("--epochs must be >= 2 (the first epoch is warmup)")

    from train import parse_set_overrides

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.data.augment import (Augmentation,
                                                       BaseTransform)
    from instancesegmentation_tpu.data.datasets import (SegDataset,
                                                        synthetic_annotation,
                                                        get_annotation)
    from instancesegmentation_tpu.data.loader import (Loader, RcnnCollate,
                                                      YolactCollate)

    cfg = get_config(args.config)
    if args.overrides:
        cfg = cfg.replace(**parse_set_overrides(args.overrides, cfg))
    if args.no_augment:
        cfg = cfg.replace(augment=False)
    workers = (args.num_workers if args.num_workers is not None
               else cfg.num_workers)

    # mirror the trainer's bucket handling (trainer.py:71-95) so benching
    # a bucketed config measures the transform training actually runs
    keep_aspect = bool(cfg.resolution_buckets)
    ann = (synthetic_annotation(cfg.data_root, vary_aspect=keep_aspect)
           if cfg.exp_name == "shape"
           else get_annotation(cfg.exp_name, cfg.data_root,
                               list(cfg.class_names)))
    tf = (Augmentation if cfg.augment else BaseTransform)(
        cfg.input_shape, keep_aspect=keep_aspect)
    ds = SegDataset(ann.train_image_path, ann.train_coco, ann.label_map,
                    transform=tf, cache_images=cfg.cache_images)
    collate = (YolactCollate(cfg.max_instances, cfg.proto_shape)
               if cfg.net == "yolact" else RcnnCollate(cfg.max_instances))
    loader = Loader(ds, args.batch, collate, num_workers=workers)

    n_img = 0
    t0 = None
    for e in range(args.epochs):
        for batch in loader.epoch(e):
            n_img += batch["image"].shape[0]
        if e == 0:                  # warmup epoch: reset counters
            n_img = 0
            t0 = time.perf_counter()
    dt = time.perf_counter() - t0
    print(f"{args.config} {tuple(cfg.input_shape)} b{args.batch} "
          f"workers={workers} augment={cfg.augment}: "
          f"{n_img / dt:.1f} img/s host pipeline "
          f"({1e3 * dt / max(n_img // args.batch, 1):.1f} ms/batch)")


if __name__ == "__main__":
    main()
