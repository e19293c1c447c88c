#!/usr/bin/env python
"""Isolated train-step benchmark (real TPU): fwd+loss+bwd+optimizer+EMA,
donated state, pinned buffers, synthetic batch — the same jitted program
the trainer runs, without the data loader.

  python tools/bench_train_step.py --config yolact_base --batch 8
  python tools/bench_train_step.py --config mask_rcnn_base --batch 4 \
      --trace /tmp/trace_rcnn

With --trace, iterations 3..8 run under jax.profiler.trace for per-op
attribution (view op totals with tools/trace_summary.py).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(cfg, batch):
    import jax.numpy as jnp
    h, w = cfg.input_shape
    g = cfg.max_instances
    rs = np.random.RandomState(0)
    boxes = np.zeros((batch, g, 4), np.float32)
    xy = rs.uniform(0.1, 0.6, (batch, g, 2))
    wh = rs.uniform(0.1, 0.35, (batch, g, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = np.minimum(xy + wh, 0.99)
    out = {
        # uint8 like the live loader (normalize runs inside the step)
        "image": rs.randint(0, 256, (batch, h, w, 3)).astype(np.uint8),
        "boxes": boxes,
        "labels": rs.randint(0, cfg.num_classes, (batch, g)).astype(np.int32),
        "valid": np.ones((batch, g), bool),
        "is_crowd": np.zeros((batch, g), bool),
    }
    if cfg.net == "yolact":
        ph, pw = cfg.proto_shape        # input/4, or input/2 (proto_double)
        out["masks"] = (rs.rand(batch, g, ph, pw) > 0.7).astype(np.float32)
    else:
        out["masks"] = (rs.rand(batch, g, h, w) > 0.7).astype(np.uint8)
    return {k: jnp.asarray(v) for k, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="yolact_base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", default="")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--phase", choices=["freeze", "unfreeze"],
                    default="unfreeze",
                    help="freeze = frozen backbone step (phase-1 program)")
    ap.add_argument("--freeze_bn_stats", action="store_true",
                    help="with --phase freeze: apply the frozen-stats "
                    "backbone clone (cfg.freeze_phase_bn_stats mode)")
    ap.add_argument("--mem_only", action="store_true",
                    help="compile only; print XLA memory_analysis "
                    "(HBM accounting) and exit without executing")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    dest="overrides",
                    help="typed config overrides, e.g. "
                    "--set input_shape=(832,640) to time one bucket shape")
    args = ap.parse_args()

    import jax

    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.ops.anchors import yolact_anchors
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    from instancesegmentation_tpu.train.steps import (
        make_mask_rcnn_train_step, make_yolact_train_step)
    from instancesegmentation_tpu.utils.device import pin_to_device

    cfg = get_config(args.config, mixed_precision=not args.f32)
    if args.overrides:
        from train import parse_set_overrides
        cfg = cfg.replace(**parse_set_overrides(args.overrides, cfg))
    frozen = args.phase == "freeze"
    model = get_model(cfg, train_mode=True,
                      frozen_bn=True if (frozen and args.freeze_bn_stats)
                      else None)
    batch = make_batch(cfg, args.batch)

    rng = jax.random.key(0)
    sample = np.zeros((1,) + tuple(cfg.input_shape) + (3,), np.float32)
    state = create_train_state(model, cfg, rng, sample, lr=1e-4,
                               frozen_backbone=frozen)
    tx = make_phase_optimizer(cfg, 1e-4, frozen, state.params)

    if cfg.net == "yolact":
        anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
        step_fn = make_yolact_train_step(model, tx, anchors, cfg,
                                         frozen_backbone=frozen)
    else:
        step_fn = make_mask_rcnn_train_step(model, tx, cfg,
                                            frozen_backbone=frozen)
    step = jax.jit(step_fn, donate_argnums=0)

    dev = jax.devices()[0]

    if args.mem_only:
        # Static HBM accounting from the compiled executable —
        # dev.memory_stats() is empty on the tunneled axon backend, so
        # this is the authoritative per-graph memory number. Hits the
        # persistent compile cache (same HLO as the timed path).
        compiled = step.lower(state, batch, rng).compile()
        m = compiled.memory_analysis()
        gib = 2.0 ** 30
        print(f"{cfg.net} {cfg.input_shape} b{args.batch} "
              f"phase={args.phase} memory_analysis: "
              f"args {m.argument_size_in_bytes / gib:.2f} GiB, "
              f"out {m.output_size_in_bytes / gib:.2f} GiB, "
              f"temp {m.temp_size_in_bytes / gib:.2f} GiB, "
              f"alias {m.alias_size_in_bytes / gib:.2f} GiB, "
              f"peak ~{(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes - m.alias_size_in_bytes) / gib:.2f} GiB")
        return

    state = pin_to_device(jax.device_put(state, dev))
    batch = pin_to_device(jax.device_put(batch, dev))
    rng = pin_to_device(jax.device_put(rng, dev))

    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s  "
          f"total={float(metrics['total']):.3f}")
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    float(np.asarray(metrics["total"]))

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(6):
                state, metrics = step(state, batch, rng)
            float(np.asarray(metrics["total"]))
        print(f"trace written to {args.trace}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, rng)
    float(np.asarray(metrics["total"]))   # host sync (axon dispatch-ack)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{cfg.net} {cfg.input_shape} b{args.batch}: "
          f"{dt * 1e3:.1f} ms/step = {args.batch / dt:.1f} img/s")
    try:
        ms = dev.memory_stats() or {}
    except Exception:
        ms = {}
    if ms.get("peak_bytes_in_use"):
        print(f"HBM peak {ms['peak_bytes_in_use'] / 2**30:.2f} GiB"
              + (f" / limit {ms['bytes_limit'] / 2**30:.2f} GiB"
                 if ms.get("bytes_limit") else ""))


if __name__ == "__main__":
    main()
