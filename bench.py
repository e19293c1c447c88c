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

import json
import sys
import time


BASELINE_FPS = 42.5


def main():
    import jax
    import numpy as np

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.yolact.predict import make_infer_fn
    from instancesegmentation_tpu.ops.anchors import yolact_anchors

    cfg = get_config("yolact_base", mixed_precision=True)
    model = get_model(cfg, train_mode=False)
    rng = jax.random.key(0)
    image = jax.random.normal(rng, (1,) + tuple(cfg.input_shape) + (3,))
    variables = model.init({"params": rng}, image, train=False)

    anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
    infer = jax.jit(make_infer_fn(model, anchors, cfg.confidence,
                                  cfg.nms_iou, cfg.top_k, cfg.max_detections))

    # compile + warmup
    out = infer(variables, image)
    jax.block_until_ready(out)
    for _ in range(5):
        out = infer(variables, image)
    jax.block_until_ready(out)

    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, image)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "yolact_r50_544_infer_fps",
        "value": round(fps, 2),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
