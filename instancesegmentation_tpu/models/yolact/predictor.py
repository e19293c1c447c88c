"""High-level YOLACT predictor — the user-facing inference object.

API parity with the reference predictor class
(/root/reference/inst_model/yolact/yolact.py:21-278): ``detect_image``
(overlay rendering), ``get_FPS`` (timed loop), ``get_map_out`` (raw
outputs for COCO eval), same default thresholds (:22-60). The compute path
is one jitted function; only decode-to-original-resolution and drawing run
on host.
"""

from __future__ import annotations

import colorsys
import time
from typing import Optional

import jax
import numpy as np

from instancesegmentation_tpu.config import Config
from instancesegmentation_tpu.models import get_model
from instancesegmentation_tpu.models.yolact.predict import (finish_detections,
                                                            make_infer_fn)
from instancesegmentation_tpu.ops.anchors import yolact_anchors


def class_colors(n: int):
    """HSV-spread palette (inst_model/yolact/yolact.py:88-108)."""
    hsv = [(i / n, 1.0, 1.0) for i in range(n)]
    rgb = [tuple(int(255 * c) for c in colorsys.hsv_to_rgb(*t)) for t in hsv]
    return rgb


class YolactPredictor:
    def __init__(self, cfg: Config, variables=None, checkpoint: Optional[str] = None,
                 confidence: Optional[float] = None,
                 nms_iou: Optional[float] = None):
        self.cfg = cfg
        self.confidence = confidence if confidence is not None else cfg.confidence
        self.nms_iou = nms_iou if nms_iou is not None else cfg.nms_iou
        self.input_shape = tuple(cfg.input_shape)
        self.class_names = list(cfg.class_names)
        self.colors = class_colors(len(self.class_names))

        self.model = get_model(cfg, train_mode=False)
        self.anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)

        if variables is None:
            if checkpoint is None:
                raise ValueError("need variables or checkpoint")
            from instancesegmentation_tpu.train.checkpoints import \
                load_inference_variables
            variables = load_inference_variables(checkpoint)
        # pin once: host-backed params are re-uploaded on EVERY call
        # on the tunneled backend (~3.7 s for Mask R-CNN; utils/device.py)
        from instancesegmentation_tpu.utils.device import pin_to_device
        self.variables = pin_to_device(variables)

        infer = make_infer_fn(self.model, self.anchors, self.confidence,
                              self.nms_iou, cfg.top_k, cfg.max_detections,
                              traditional_nms=cfg.traditional_nms)

        def infer_u8(variables, x):
            # H2D ships uint8 (4x byte cut); normalize fuses into the graph
            from instancesegmentation_tpu.ops.preprocess import \
                normalize_on_device
            return infer(variables, normalize_on_device(x, "yolact"))

        self._infer = jax.jit(infer_u8)

    # ------------------------------------------------------------------
    def _preprocess(self, image_rgb: np.ndarray) -> np.ndarray:
        """Resize to input_shape, keep uint8. The reference resizes a PIL
        image (yolact.py:131-145, BICUBIC) whose output is ALREADY 8-bit,
        so quantized-uint8 shipping matches its numerics exactly."""
        import cv2
        from instancesegmentation_tpu.data.loader import quantize_uint8
        ih, iw = self.input_shape
        resized = cv2.resize(quantize_uint8(image_rgb), (iw, ih),
                             interpolation=cv2.INTER_CUBIC)
        return resized[None]

    def raw_detect(self, image_rgb: np.ndarray):
        """Forward + NMS; returns host-finished detections dict."""
        batch = self._preprocess(image_rgb)
        raw = self._infer(self.variables, batch)
        raw0 = jax.tree_util.tree_map(lambda x: np.asarray(x[0]), raw)
        return finish_detections(raw0, image_rgb.shape[:2])

    def raw_detect_batch(self, images_rgb):
        """Batched inference over a list of images (one device dispatch for
        the whole batch — the high-throughput path for dir_predict/video).
        Note: a new batch size triggers one extra XLA compile."""
        batch = np.concatenate([self._preprocess(im) for im in images_rgb])
        raw = self._infer(self.variables, batch)
        raw = jax.tree_util.tree_map(np.asarray, raw)
        return [finish_detections(
            jax.tree_util.tree_map(lambda x, i=i: x[i], raw),
            images_rgb[i].shape[:2]) for i in range(len(images_rgb))]

    # -- reference API ---------------------------------------------------
    def detect_image(self, image_rgb: np.ndarray) -> np.ndarray:
        """Overlay boxes/labels/masks (yolact.py:130-199). Returns RGB."""
        import cv2
        det = self.raw_detect(image_rgb)
        out = image_rgb.astype(np.uint8).copy()
        if len(det["scores"]) == 0:
            return out

        # 0.4/0.6 blended instance masks (yolact.py:168-180)
        overlay = out.copy()
        for i in range(len(det["scores"])):
            color = self.colors[int(det["classes"][i]) % len(self.colors)]
            overlay[det["masks"][i] & (det["masks_arg"] == i + 1)] = color
        out = cv2.addWeighted(overlay, 0.4, out, 0.6, 0)

        for i in range(len(det["scores"])):
            x1, y1, x2, y2 = det["boxes"][i].astype(int)
            cls = int(det["classes"][i])
            color = self.colors[cls % len(self.colors)]
            cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
            label = f"{self.class_names[cls]} {det['scores'][i]:.2f}"
            cv2.putText(out, label, (x1, max(y1 - 4, 12)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
        return out

    def get_FPS(self, image_rgb: np.ndarray, test_interval: int = 100) -> float:
        """Mean seconds/iter over test_interval forward+decode loops
        (yolact.py:201-243). The sync is a host materialization — on
        tunneled backends block_until_ready acks dispatch, not completion."""
        batch = self._preprocess(image_rgb)
        raw = self._infer(self.variables, batch)       # warmup/compile
        np.asarray(raw.scores)
        t0 = time.time()
        for _ in range(test_interval):
            raw = self._infer(self.variables, batch)
        np.asarray(raw.scores)
        return (time.time() - t0) / test_interval

    def get_map_out(self, image_rgb: np.ndarray):
        """Raw eval outputs (yolact.py:245-278): boxes px, scores, classes,
        full-res binary masks."""
        det = self.raw_detect(image_rgb)
        return (det["boxes"], det["scores"], det["classes"], det["masks"])

    def get_map_out_batch(self, images_rgb, n_valid=None):
        """Batched get_map_out: one device dispatch for the whole chunk
        (the eval loop's throughput path — PERF_NOTES lead #5).
        ``n_valid`` (eval tail-padding marker) is accepted for API parity
        with the Mask R-CNN predictor; YOLACT tracks no per-image pool
        stats, so it has nothing to exclude."""
        dets = self.raw_detect_batch(images_rgb)
        return [(d["boxes"], d["scores"], d["classes"], d["masks"])
                for d in dets]
