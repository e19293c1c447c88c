#!/usr/bin/env python
"""Benchmark: YOLACT-R50 544x544 single-image inference throughput on the
local accelerator (the reference's get_FPS protocol:
/root/reference/inst_model/yolact/yolact.py:201-243 — mean latency over
test_interval forward+decode iterations at batch 1).

Prints ONE json line:
  {"metric": "yolact_r50_544_infer_fps", "value": <img/s>, "unit": "img/s",
   "vs_baseline": <value / 42.5>}

Baseline 42.5 FPS = YOLACT paper R50-550 on Titan Xp (BASELINE.md: the
reference repo publishes no numbers of its own; PAPERS.md arXiv 1904.02689).
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")  # silence XLA AOT-cache spam


import argparse
import json
import sys
import time


BASELINE_FPS = 42.5


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=1,
                   help="inference batch size (default 1 = the reference's "
                        "get_FPS protocol; larger batches amortize dispatch)")
    p.add_argument("--iters", type=int, default=100)
    return p.parse_args(argv)


def main():
    import os

    import jax
    import numpy as np

    # persistent compile cache: TPU remote compiles are expensive
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.yolact.predict import make_infer_fn
    from instancesegmentation_tpu.ops.anchors import yolact_anchors

    args = parse_args()
    cfg = get_config("yolact_base", mixed_precision=True)
    model = get_model(cfg, train_mode=False)
    rng = jax.random.key(0)
    # init on host CPU (a throwaway random net); only the inference graph
    # is compiled for the accelerator
    import jax.numpy as jnp
    with jax.default_device(jax.devices("cpu")[0]):
        image_h = np.random.RandomState(0).randn(
            args.batch, *cfg.input_shape, 3).astype(np.float32)
        init_model = (model.clone(dtype=jnp.float32)
                      if cfg.mixed_precision else model)
        variables = init_model.init({"params": rng}, image_h, train=False)
    from instancesegmentation_tpu.utils.device import pin_to_device
    device = jax.devices()[0]
    # pin: device_put buffers stay host-backed on the tunneled backend and
    # re-upload per call (utils/device.py)
    image = pin_to_device(jax.device_put(image_h, device))
    variables = pin_to_device(jax.device_put(variables, device))

    anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
    infer = jax.jit(make_infer_fn(model, anchors, cfg.confidence,
                                  cfg.nms_iou, cfg.top_k, cfg.max_detections))

    def sync(o):
        # host materialization: on the tunneled backend block_until_ready
        # returns at dispatch-ack, NOT completion — only a D2H forces the
        # stream to drain
        return float(np.asarray(o.scores).ravel()[0])

    # compile + warmup
    out = infer(variables, image)
    sync(out)
    for _ in range(5):
        out = infer(variables, image)
    sync(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = infer(variables, image)
    sync(out)
    dt = (time.perf_counter() - t0) / args.iters

    fps = args.batch / dt
    suffix = "" if args.batch == 1 else f"_b{args.batch}"
    print(json.dumps({
        "metric": f"yolact_r50_544_infer_fps{suffix}",
        "value": round(fps, 2),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
