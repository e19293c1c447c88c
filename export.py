#!/usr/bin/env python
"""Export CLI: serialize the inference function to a StableHLO artifact and
(optionally) run a replay sanity check.

The TPU-native replacement for /root/reference/export.py (ONNX opset-12 +
onnxruntime, :96-318): ``jax.export`` captures the jitted forward+decode+NMS
graph with static shapes; the artifact replays on any JAX backend via
``jax.export.deserialize``. Flags mirror the reference where meaningful
(--confidence/--nms_iou/--traditional-nms are decode-time constants baked
into the graph, like the reference's end2end path).
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")  # silence XLA AOT-cache spam


import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="yolact_base")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax state dir; random init if omitted (graph-only export)")
    p.add_argument("--output", type=str, default=None,
                   help="output path (default <out>/<name>.stablehlo)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--confidence", type=float, default=None)
    p.add_argument("--nms_iou", type=float, default=None)
    p.add_argument("--verify", action="store_true",
                   help="deserialize + run the artifact and compare outputs")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="override any Config field (repeatable); must match "
                        "the overrides the checkpoint was trained with")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model

    cfg = get_config(args.config)
    if args.set:
        from train import parse_set_overrides
        cfg = cfg.replace(**parse_set_overrides(args.set, cfg))
    out_dir = os.path.join(cfg.out_root, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    path = args.output or os.path.join(out_dir, f"{cfg.name}.stablehlo")

    model = get_model(cfg, train_mode=False)
    image = np.zeros((args.batch,) + tuple(cfg.input_shape) + (3,), np.float32)
    if args.checkpoint:
        from instancesegmentation_tpu.train.checkpoints import \
            load_inference_variables
        variables = load_inference_variables(args.checkpoint)
    else:
        # init on host CPU (slow to compile on the TPU remote path)
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                variables = model.init({"params": jax.random.key(0)}, image,
                                       train=False)
        else:
            variables = model.init({"params": jax.random.key(0)}, image,
                                   train=False)

    conf = args.confidence if args.confidence is not None else cfg.confidence
    iou = args.nms_iou if args.nms_iou is not None else cfg.nms_iou

    def register(nt, name):
        # namedtuple outputs need registered serialization
        try:
            jax.export.register_namedtuple_serialization(
                nt, serialized_name=name)
        except ValueError:
            pass  # already registered

    if cfg.net == "yolact":
        from instancesegmentation_tpu.models.yolact.predict import (
            RawDetections, make_infer_fn)
        from instancesegmentation_tpu.ops.anchors import yolact_anchors
        anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
        infer = make_infer_fn(model, anchors, conf, iou, cfg.top_k,
                              cfg.max_detections)
        register(RawDetections, "instseg.RawDetections")
    else:
        # Mask R-CNN export path (the reference exports whatever
        # get_model(opt) returns, export.py:158-162)
        from instancesegmentation_tpu.models.mask_rcnn.meta import \
            make_mask_rcnn_infer_fn
        from instancesegmentation_tpu.models.mask_rcnn.roi_heads import \
            Detections
        infer = make_mask_rcnn_infer_fn(model, cfg,
                                        max_det=cfg.max_detections,
                                        nms_thresh=iou)
        register(Detections, "instseg.Detections")

    # close over weights: the artifact is self-contained like an .onnx file
    fn = jax.jit(lambda img: infer(variables, img))
    exported = jax.export.export(fn)(
        jax.ShapeDtypeStruct(image.shape, image.dtype))
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    print(f"exported {path} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms})")

    if args.verify:
        replay = jax.export.deserialize(blob)
        test = np.random.RandomState(0).randn(*image.shape).astype(np.float32)
        a = jax.tree_util.tree_map(np.asarray, fn(test))
        b = jax.tree_util.tree_map(np.asarray, replay.call(test))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-4)
        print("replay verified: outputs match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
