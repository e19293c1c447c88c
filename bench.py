#!/usr/bin/env python
"""Benchmark: instance-segmentation inference throughput on the local
accelerator, following the reference's get_FPS protocol
(/root/reference/inst_model/yolact/yolact.py:201-243 and
inst_model/Mask_RCNN/mask_rcnn.py:230-271 — mean latency over
test_interval forward+decode iterations).

Prints ONE json line. The primary metric is YOLACT-R50 544^2 batch-1
inference (the BASELINE.json north star); `extra_metrics` carries the
batch-16 YOLACT row (the device-bound number — batch 1 sits on the ~1 ms
tunnel dispatch floor), Mask R-CNN R50-FPN 544^2 batch 1 AND batch 8 (the
full RPN -> NMS -> RoIAlign -> heads -> per-class NMS -> 28^2 mask
graph), and two TRAINING rows (YOLACT b8 and Mask R-CNN b4 full train
steps: fwd + loss + bwd + fused adam/EMA, uint8/bit-packed H2D like the
live loader).

Every number is the MEDIAN of --repeats timed windows; `spread_pct` =
(max-min)/median*100 so round-over-round drift is distinguishable from
tunnel noise (round-3 verdict item 7).

Baselines: 42.5 FPS = YOLACT paper R50-550 on Titan Xp (arXiv 1904.02689;
the reference repo publishes no numbers of its own — BASELINE.md);
5.13 FPS = Mask R-CNN paper "~195 ms per frame" on an M40
(arXiv 1703.06870 §4.2); the train row's baseline is this framework's own
round-1 measurement (203.8 img/s, BASELINE.md) — the reference publishes
no training throughput.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")  # silence XLA AOT-cache spam


import argparse
import json
import sys
import time

YOLACT_BASELINE_FPS = 42.5
MASK_RCNN_BASELINE_FPS = 1000.0 / 195.0
YOLACT_TRAIN_R1_BASELINE = 203.8      # round-1 self-baseline (BASELINE.md)
MASK_RCNN_TRAIN_R1_BASELINE = 50.4    # round-1 self-baseline (BASELINE.md)
BASE800_TRAIN_R4_BASELINE = 66.2      # round-4 one-off: freeze-b4 (800,800)
                                      # bucket, 60.4 ms/step (PERF_NOTES)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="all",
                   choices=("all", "yolact", "mask_rcnn"))
    p.add_argument("--batch", type=int, default=1,
                   help="inference batch size for single-model runs "
                        "(--model all always measures yolact b1+b16 and "
                        "mask_rcnn b1)")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--repeats", type=int, default=3,
                   help="timed windows per metric; value = median, "
                        "spread_pct = (max-min)/median")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   dest="overrides",
                   help="config overrides for single-model runs (e.g. "
                        "--set proto_double=true); ignored for --model all")
    return p.parse_args(argv)


def _overrides(args):
    """--set KEY=VAL pairs -> typed Config kwargs (any Config instance
    serves as the type template — one dataclass covers both models)."""
    if not getattr(args, "overrides", None):
        return {}
    from train import parse_set_overrides

    from instancesegmentation_tpu.config import get_config
    return parse_set_overrides(args.overrides, get_config("yolact_base"))


def _init_on_cpu(model, shape, mixed_precision: bool):
    """Init on host CPU (a throwaway random net); f32 clone — the init
    graph compiles pathologically slowly via the TPU remote path, and
    bf16 init compiles ~8x slower on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    image_h = np.random.RandomState(0).randn(*shape).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        init_model = model.clone(dtype=jnp.float32) if mixed_precision \
            else model
        variables = init_model.init({"params": jax.random.key(0)}, image_h,
                                    train=False)
    return image_h, variables


def _pin(tree):
    import jax

    from instancesegmentation_tpu.utils.device import pin_to_device
    return pin_to_device(jax.device_put(tree, jax.devices()[0]))


def _timed(infer, variables, image, iters, sync, repeats=3):
    """get_FPS loop. Timing must end with a host materialization of a
    SCALAR: on the tunneled backend block_until_ready acks dispatch, not
    completion, and np.asarray of a large output measures the tunnel.
    Returns a list of per-window mean seconds/iter (len = repeats)."""
    out = infer(variables, image)
    sync(out)
    for _ in range(5):
        out = infer(variables, image)
    sync(out)
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, image)
        sync(out)
        dts.append((time.perf_counter() - t0) / iters)
    return dts


def bench_yolact(batch: int, iters: int, repeats: int = 3, **over):
    import jax
    import numpy as np

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.yolact.predict import make_infer_fn
    from instancesegmentation_tpu.ops.anchors import yolact_anchors

    cfg = get_config("yolact_base", **{"mixed_precision": True, **over})
    model = get_model(cfg, train_mode=False)
    image_h, variables = _init_on_cpu(
        model, (batch,) + tuple(cfg.input_shape) + (3,), cfg.mixed_precision)
    image, variables = _pin(image_h), _pin(variables)
    anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
    infer = jax.jit(make_infer_fn(model, anchors, cfg.confidence,
                                  cfg.nms_iou, cfg.top_k,
                                  cfg.max_detections))

    def sync(o):
        return float(np.asarray(o.scores).ravel()[0])

    return [batch / d for d in
            _timed(infer, variables, image, iters, sync, repeats)]


def bench_mask_rcnn(batch: int, iters: int, repeats: int = 3, **over):
    import jax
    import numpy as np

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.mask_rcnn.meta import \
        make_mask_rcnn_infer_fn

    cfg = get_config("mask_rcnn_base", **{"mixed_precision": True, **over})
    model = get_model(cfg, train_mode=False)
    image_h, variables = _init_on_cpu(
        model, (batch,) + tuple(cfg.input_shape) + (3,), cfg.mixed_precision)
    image, variables = _pin(image_h), _pin(variables)
    infer = jax.jit(make_mask_rcnn_infer_fn(
        model, cfg, max_det=cfg.max_detections, nms_thresh=cfg.eval_nms_iou))

    def sync(o):
        return float(np.asarray(o[0].scores).ravel()[0])

    return [batch / d for d in
            _timed(infer, variables, image, iters, sync, repeats)]


def bench_yolact_train(batch: int, iters: int, repeats: int = 3):
    """Full YOLACT train step (fwd + multi-task loss + bwd + fused
    optimizer/EMA), bf16, uint8 batch like the live loader — the
    tools/bench_train_step.py protocol as a standing BENCH metric."""
    import jax
    import numpy as np

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.ops.anchors import yolact_anchors
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    from instancesegmentation_tpu.train.steps import make_yolact_train_step
    from instancesegmentation_tpu.utils.device import pin_to_device

    cfg = get_config("yolact_base", mixed_precision=True, ema=True)
    model = get_model(cfg, train_mode=True)
    h, w = cfg.input_shape
    g = cfg.max_instances
    rs = np.random.RandomState(0)
    ph, pw = cfg.proto_shape
    xy = rs.uniform(0.1, 0.6, (batch, g, 2))
    wh = rs.uniform(0.1, 0.35, (batch, g, 2))
    batch_np = {
        "image": rs.randint(0, 256, (batch, h, w, 3)).astype(np.uint8),
        "boxes": np.concatenate([xy, np.minimum(xy + wh, 1.0)],
                                -1).astype(np.float32),
        "labels": rs.randint(0, cfg.num_classes, (batch, g)).astype(np.int32),
        "masks": (rs.rand(batch, g, ph, pw) > 0.7).astype(np.uint8),
        "valid": np.ones((batch, g), bool),
        "is_crowd": np.zeros((batch, g), bool),
    }
    rng = jax.random.key(0)
    sample = np.zeros((1, h, w, 3), np.float32)
    state = create_train_state(model, cfg, rng, sample, lr=1e-4,
                               frozen_backbone=False)
    tx = make_phase_optimizer(cfg, 1e-4, False, state.params)
    anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
    step = jax.jit(make_yolact_train_step(model, tx, anchors, cfg),
                   donate_argnums=0)

    dev = jax.devices()[0]
    state = pin_to_device(jax.device_put(state, dev))
    device_batch = pin_to_device(jax.device_put(batch_np, dev))
    rng = pin_to_device(jax.device_put(jax.random.key(1), dev))

    state, metrics = step(state, device_batch, rng)
    float(np.asarray(metrics["total"]))
    for _ in range(3):
        state, metrics = step(state, device_batch, rng)
    float(np.asarray(metrics["total"]))
    fps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, device_batch, rng)
        float(np.asarray(metrics["total"]))    # host sync (dispatch-ack)
        fps.append(batch / ((time.perf_counter() - t0) / iters))
    return fps


def bench_mask_rcnn_train(batch: int, iters: int, repeats: int = 3,
                          config: str = "mask_rcnn_base",
                          frozen: bool = False):
    """Full Mask R-CNN train step (RPN + RoI heads, fwd+loss+bwd+fused
    optimizer/EMA), bf16, uint8 batch incl. image-res gt masks — the
    tools/bench_train_step.py protocol as a standing BENCH metric.

    ``config='mask_rcnn_base800', frozen=True`` benches the reference's
    REAL ~800px operating point (faster_rcnn_framework.py:257,362) at its
    freeze-phase batch 4 on the square (800,800) bucket."""
    import jax
    import numpy as np

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.ops.preprocess import pack_mask_bits
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    from instancesegmentation_tpu.train.steps import make_mask_rcnn_train_step
    from instancesegmentation_tpu.utils.device import pin_to_device

    cfg = get_config(config, mixed_precision=True, ema=True)
    model = get_model(cfg, train_mode=True)
    h, w = cfg.input_shape
    g = cfg.max_instances
    rs = np.random.RandomState(0)
    xy = rs.uniform(0.1, 0.6, (batch, g, 2))
    wh = rs.uniform(0.1, 0.35, (batch, g, 2))
    batch_np = {
        "image": rs.randint(0, 256, (batch, h, w, 3)).astype(np.uint8),
        "boxes": np.concatenate([xy, np.minimum(xy + wh, 0.99)],
                                -1).astype(np.float32),
        "labels": rs.randint(0, cfg.num_classes, (batch, g)).astype(np.int32),
        # image-res gt masks ship bit-packed like the live loader
        "masks": pack_mask_bits((rs.rand(batch, g, h, w) > 0.7)
                                .astype(np.uint8)),
        "valid": np.ones((batch, g), bool),
        "is_crowd": np.zeros((batch, g), bool),
    }
    rng = jax.random.key(0)
    sample = np.zeros((1, h, w, 3), np.float32)
    state = create_train_state(model, cfg, rng, sample, lr=1e-4,
                               frozen_backbone=frozen)
    tx = make_phase_optimizer(cfg, 1e-4, frozen, state.params)
    step = jax.jit(make_mask_rcnn_train_step(model, tx, cfg,
                                             frozen_backbone=frozen),
                   donate_argnums=0)

    dev = jax.devices()[0]
    state = pin_to_device(jax.device_put(state, dev))
    device_batch = pin_to_device(jax.device_put(batch_np, dev))
    rng = pin_to_device(jax.device_put(jax.random.key(1), dev))

    state, metrics = step(state, device_batch, rng)
    float(np.asarray(metrics["total"]))
    for _ in range(3):
        state, metrics = step(state, device_batch, rng)
    float(np.asarray(metrics["total"]))
    fps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, device_batch, rng)
        float(np.asarray(metrics["total"]))    # host sync (dispatch-ack)
        fps.append(batch / ((time.perf_counter() - t0) / iters))
    return fps


def main():
    import jax

    # persistent compile cache: TPU remote compiles are expensive; the
    # shared helper keeps CLIs and benches on one cache directory
    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()

    args = parse_args()

    def row(metric, fps_list, baseline):
        import statistics
        med = statistics.median(fps_list)
        spread = (max(fps_list) - min(fps_list)) / med * 100 \
            if len(fps_list) > 1 else 0.0
        return {"metric": metric, "value": round(med, 2), "unit": "img/s",
                "vs_baseline": round(med / baseline, 3),
                "spread_pct": round(spread, 1)}

    if args.model == "yolact":
        fps = bench_yolact(args.batch, args.iters, args.repeats,
                           **_overrides(args))
        suffix = "" if args.batch == 1 else f"_b{args.batch}"
        print(json.dumps(row(f"yolact_r50_544_infer_fps{suffix}", fps,
                             YOLACT_BASELINE_FPS)))
        return 0
    if args.model == "mask_rcnn":
        fps = bench_mask_rcnn(args.batch, args.iters, args.repeats,
                              **_overrides(args))
        suffix = "" if args.batch == 1 else f"_b{args.batch}"
        print(json.dumps(row(f"mask_rcnn_r50_544_infer_fps{suffix}", fps,
                             MASK_RCNN_BASELINE_FPS)))
        return 0

    # --model all: headline + extra metrics in one line
    r = args.repeats
    fps_b1 = bench_yolact(1, args.iters, r)
    fps_b16 = bench_yolact(16, max(args.iters // 4, 25), r)
    fps_rcnn = bench_mask_rcnn(1, args.iters, r)
    fps_rcnn8 = bench_mask_rcnn(8, max(args.iters // 8, 13), r)
    fps_train8 = bench_yolact_train(8, max(args.iters // 4, 25), r)
    fps_rtrain4 = bench_mask_rcnn_train(4, max(args.iters // 8, 13), r)
    fps_b800 = bench_mask_rcnn_train(4, max(args.iters // 8, 13), r,
                                     config="mask_rcnn_base800", frozen=True)
    out = row("yolact_r50_544_infer_fps", fps_b1, YOLACT_BASELINE_FPS)
    out["extra_metrics"] = [
        row("yolact_r50_544_infer_fps_b16", fps_b16, YOLACT_BASELINE_FPS),
        row("mask_rcnn_r50_544_infer_fps", fps_rcnn, MASK_RCNN_BASELINE_FPS),
        row("mask_rcnn_r50_544_infer_fps_b8", fps_rcnn8,
            MASK_RCNN_BASELINE_FPS),
        row("yolact_r50_544_train_fps_b8", fps_train8,
            YOLACT_TRAIN_R1_BASELINE),
        row("mask_rcnn_r50_544_train_fps_b4", fps_rtrain4,
            MASK_RCNN_TRAIN_R1_BASELINE),
        row("mask_rcnn_base800_train_freeze_fps_b4", fps_b800,
            BASE800_TRAIN_R4_BASELINE),
    ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
