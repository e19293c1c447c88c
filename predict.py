#!/usr/bin/env python
"""Prediction CLI: single images, folders, video, FPS benchmark.

Mirrors /root/reference/predict.py (:14-119): modes ``dir_predict``
(folder -> img_out/*.png), ``video`` (capture -> overlay -> writer),
``fps`` (timed loop), ``predict`` (single image path). Uses the best
checkpoint by default (predict.py:42).
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")  # silence XLA AOT-cache spam


import argparse
import os
import sys
import time


def build_predictor(args):
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_predictor

    overrides = {k: v for k, v in (("data_root", args.data_root),
                                   ("out_root", args.out_root)) if v}
    if args.traditional_nms:
        overrides["traditional_nms"] = True
    cfg = get_config(args.config, **overrides)
    if getattr(args, "set", None):
        from train import parse_set_overrides
        cfg = cfg.replace(**parse_set_overrides(args.set, cfg))
    ckpt = args.checkpoint or os.path.join(cfg.out_root, cfg.name, "ckpt",
                                           "best_epoch_weights")
    return cfg, get_predictor(cfg, checkpoint=ckpt,
                              confidence=args.confidence,
                              nms_iou=args.nms_iou)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="yolact_base")
    p.add_argument("--mode", type=str, default="dir_predict",
                   choices=("predict", "dir_predict", "video", "fps"))
    p.add_argument("--image", type=str, default=None, help="for --mode predict")
    p.add_argument("--dir_origin_path", type=str, default="test_images")
    p.add_argument("--dir_save_path", type=str, default="img_out")
    p.add_argument("--video_path", type=str, default="0",
                   help="path or camera index")
    p.add_argument("--video_save_path", type=str, default="")
    p.add_argument("--video_fps", type=float, default=25.0)
    p.add_argument("--test_interval", type=int, default=100)
    p.add_argument("--fps_image_path", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--out_root", type=str, default=None)
    p.add_argument("--confidence", type=float, default=None)
    p.add_argument("--nms_iou", type=float, default=None)
    p.add_argument("--traditional_nms", action="store_true",
                   help="exact per-class NMS instead of Fast-NMS "
                        "(reference export.py:109 / utils_bbox.py:102)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="override any Config field (repeatable); must match "
                        "the overrides the checkpoint was trained with")
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    cfg, model = build_predictor(args)

    def read_rgb(path):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    if args.mode == "predict":
        out = model.detect_image(read_rgb(args.image))
        dst = os.path.splitext(args.image)[0] + "_out.png"
        cv2.imwrite(dst, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        print(f"saved {dst}")

    elif args.mode == "dir_predict":
        os.makedirs(args.dir_save_path, exist_ok=True)
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        names = sorted(n for n in os.listdir(args.dir_origin_path)
                       if n.lower().endswith(exts))
        for name in names:
            out = model.detect_image(read_rgb(
                os.path.join(args.dir_origin_path, name)))
            dst = os.path.join(args.dir_save_path,
                               os.path.splitext(name)[0] + ".png")
            cv2.imwrite(dst, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
            print(f"{name} -> {dst}")

    elif args.mode == "video":
        src = int(args.video_path) if args.video_path.isdigit() else args.video_path
        cap = cv2.VideoCapture(src)
        if not cap.isOpened():
            raise RuntimeError(f"cannot open video {args.video_path}")
        writer = None
        if args.video_save_path:
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            writer = cv2.VideoWriter(
                args.video_save_path, cv2.VideoWriter_fourcc(*"XVID"),
                args.video_fps, (w, h))
        fps = 0.0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            t0 = time.time()
            out = model.detect_image(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            fps = 0.9 * fps + 0.1 / max(time.time() - t0, 1e-9)
            out = cv2.cvtColor(out, cv2.COLOR_RGB2BGR)
            cv2.putText(out, f"fps={fps:.2f}", (8, 24),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 0), 2)
            if writer is not None:
                writer.write(out)
        cap.release()
        if writer is not None:
            writer.release()
            print(f"saved {args.video_save_path}")

    elif args.mode == "fps":
        if args.fps_image_path:
            img = read_rgb(args.fps_image_path)
        else:
            img = (np.random.RandomState(0)
                   .randint(0, 255, cfg.input_shape + (3,)).astype(np.uint8))
        sec = model.get_FPS(img, args.test_interval)
        print(f"{sec:.4f} seconds, {1.0 / sec:.2f} FPS, @batch_size 1")
    return 0


if __name__ == "__main__":
    sys.exit(main())
