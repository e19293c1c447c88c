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
    p.add_argument("--dynamic_batch", action="store_true",
                   help="export with a SYMBOLIC batch dimension (one "
                        "artifact serves any batch size; the reference's "
                        "--dynamic-batch, export.py:96-113)")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering platforms baked into the "
                        "artifact (default cpu,tpu: the artifact replays "
                        "on either backend)")
    p.add_argument("--confidence", type=float, default=None)
    p.add_argument("--nms_iou", type=float, default=None)
    p.add_argument("--verify", action="store_true",
                   help="deserialize + run the artifact and compare "
                        "outputs; cross-checks the CPU backend when the "
                        "native run is on an accelerator, and multiple "
                        "batch sizes under --dynamic_batch")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="override any Config field (repeatable); must match "
                        "the overrides the checkpoint was trained with")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
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
                              cfg.max_detections,
                              traditional_nms=cfg.traditional_nms)
        register(RawDetections, "instseg.RawDetections")
    else:
        # Mask R-CNN export path (the reference exports whatever
        # get_model(opt) returns, export.py:158-162)
        from instancesegmentation_tpu.models.mask_rcnn.meta import \
            make_mask_rcnn_infer_fn
        from instancesegmentation_tpu.models.mask_rcnn.roi_heads import \
            Detections
        # serialized artifacts must stay portable across platforms: pin
        # the pure-XLA separable RoIAlign (the auto sorted-kernel pick
        # would embed a TPU-only Mosaic custom-call in the StableHLO)
        os.environ.setdefault("INSTSEG_ROI_BACKEND", "separable")
        infer = make_mask_rcnn_infer_fn(model, cfg,
                                        max_det=cfg.max_detections,
                                        nms_thresh=iou)
        register(Detections, "instseg.Detections")

    # close over weights: the artifact is self-contained like an .onnx file
    fn = jax.jit(lambda img: infer(variables, img))
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    if args.dynamic_batch:
        # symbolic batch: one artifact serves any batch size (the
        # reference's dynamic_axes in torch.onnx.export, export.py:181)
        (b_dim,) = jax.export.symbolic_shape("b")
        in_shape = (b_dim,) + image.shape[1:]
    else:
        in_shape = image.shape
    exported = jax.export.export(fn, platforms=platforms)(
        jax.ShapeDtypeStruct(in_shape, image.dtype))
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    print(f"exported {path} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms}, in_shape={in_shape})")

    if args.verify:
        replay = jax.export.deserialize(blob)
        batches = ((1, max(args.batch, 2)) if args.dynamic_batch
                   else (args.batch,))
        native_platform = jax.devices()[0].platform
        for nb in batches:
            test = np.random.RandomState(0).randn(
                nb, *image.shape[1:]).astype(np.float32)
            a = jax.tree_util.tree_map(np.asarray, fn(test))
            b = jax.tree_util.tree_map(np.asarray, replay.call(test))
            _assert_dets_close(a, b, what=f"same-backend replay b{nb}")
            # cross-backend: deserialize + execute on the CPU backend and
            # compare against the native (e.g. TPU) outputs
            if "cpu" in exported.platforms and native_platform != "cpu":
                try:
                    cpu = jax.devices("cpu")[0]
                except RuntimeError:
                    cpu = None
                if cpu is not None:
                    c = jax.tree_util.tree_map(
                        np.asarray,
                        jax.jit(replay.call, device=cpu)(test))
                    _assert_dets_close(a, c, rtol=5e-2, atol=5e-2,
                                       flip_frac=0.05,
                                       what=f"cpu-backend replay b{nb}")
            print(f"replay verified (batch {nb}): outputs match")
    return 0


def _assert_dets_close(a, b, rtol=1e-4, atol=1e-4, flip_frac=0.0,
                       what="replay"):
    """Tree compare for detection outputs. Exact-graph replays must match
    to tight tolerance; CROSS-BACKEND replays of NMS-bearing graphs can
    legitimately flip borderline detections (conv numerics differ between
    backends, and suppression is a hard threshold), so bool/int leaves
    allow a small flip fraction and float leaves are compared on the
    agreeing entries."""
    import jax
    import numpy as np
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert x.shape == y.shape and x.dtype == y.dtype, \
            f"{what}: structure mismatch {x.shape}/{x.dtype} vs {y.shape}/{y.dtype}"
        if flip_frac == 0.0:
            np.testing.assert_allclose(x, y, rtol=rtol, atol=atol,
                                       err_msg=what)
            continue
        if x.dtype == bool or np.issubdtype(x.dtype, np.integer):
            flips = np.mean(x != y)
            assert flips <= flip_frac, \
                f"{what}: {flips:.3%} of {x.dtype} entries flipped"
        else:
            ok = np.isclose(x, y, rtol=rtol, atol=atol)
            assert np.mean(ok) >= 1.0 - flip_frac, \
                f"{what}: {np.mean(~ok):.3%} of float entries out of " \
                f"tolerance (max |diff| {np.abs(x - y).max():.4f})"


if __name__ == "__main__":
    sys.exit(main())
