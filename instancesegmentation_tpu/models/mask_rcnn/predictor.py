"""High-level Mask R-CNN predictor (detect_image / get_FPS / get_map_out).

API parity with /root/reference/inst_model/Mask_RCNN/mask_rcnn.py:22-332;
mask pasting follows paste_masks_in_image
(net/network_files/transform.py:388-418): expand the 28^2 mask by the 1px
border ratio, bilinear-resize into the (clipped) box, paste at image
coordinates, threshold 0.5.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from instancesegmentation_tpu.config import Config
from instancesegmentation_tpu.models import get_model
from instancesegmentation_tpu.models.mask_rcnn.meta import make_mask_rcnn_infer_fn
from instancesegmentation_tpu.models.yolact.predictor import class_colors


def paste_mask(mask28: np.ndarray, box_xyxy: np.ndarray, im_h: int, im_w: int,
               thresh: float = 0.5) -> np.ndarray:
    """One mask (M, M) probs + box -> (H, W) bool."""
    import cv2
    m = mask28.shape[0]
    scale = (m + 2) / m
    # expand box like the reference's expand_boxes (transform.py:388-400)
    cx, cy = (box_xyxy[0] + box_xyxy[2]) / 2, (box_xyxy[1] + box_xyxy[3]) / 2
    hw = (box_xyxy[2] - box_xyxy[0]) * scale / 2
    hh = (box_xyxy[3] - box_xyxy[1]) * scale / 2
    x1, y1 = int(np.floor(cx - hw)), int(np.floor(cy - hh))
    x2, y2 = int(np.ceil(cx + hw)), int(np.ceil(cy + hh))

    padded = np.zeros((m + 2, m + 2), np.float32)
    padded[1:-1, 1:-1] = mask28
    w, h = max(x2 - x1, 1), max(y2 - y1, 1)
    resized = cv2.resize(padded, (w, h), interpolation=cv2.INTER_LINEAR)

    out = np.zeros((im_h, im_w), bool)
    ox1, oy1 = max(x1, 0), max(y1, 0)
    ox2, oy2 = min(x2, im_w), min(y2, im_h)
    if ox2 > ox1 and oy2 > oy1:
        out[oy1:oy2, ox1:ox2] = \
            resized[oy1 - y1:oy2 - y1, ox1 - x1:ox2 - x1] > thresh
    return out


class MaskRCNNPredictor:
    def __init__(self, cfg: Config, variables=None,
                 checkpoint: Optional[str] = None,
                 confidence: Optional[float] = None,
                 nms_iou: Optional[float] = None):
        self.cfg = cfg
        self.confidence = confidence if confidence is not None else cfg.confidence
        self.nms_iou = nms_iou if nms_iou is not None else cfg.eval_nms_iou
        self.input_shape = tuple(cfg.input_shape)
        # bucketed configs evaluate the way they train: keep-aspect resize
        # into the nearest bucket + pad, then un-pad on postprocess — the
        # GeneralizedRCNNTransform inference path (reference
        # transform.py:256-301 resize, :388-418 postprocess un-scale)
        self.buckets = (tuple(tuple(int(x) for x in b)
                              for b in cfg.resolution_buckets)
                        if cfg.resolution_buckets else None)
        self.class_names = list(cfg.class_names)
        self.colors = class_colors(len(self.class_names))
        # box-head NMS candidate-pool saturation accounting (the static
        # pool is reference-equivalent only while every above-threshold
        # candidate fits — make overflow observable, round-4 verdict)
        self.pool_size = int(getattr(cfg, "box_nms_candidates", 1024))
        self.reset_pool_stats()

        self.model = get_model(cfg, train_mode=False)
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
        inner = make_mask_rcnn_infer_fn(
            self.model, cfg, max_det=cfg.max_detections,
            nms_thresh=self.nms_iou)

        def infer_u8(variables, x):
            # H2D ships uint8; fused double-normalize on device
            from instancesegmentation_tpu.ops.preprocess import \
                normalize_on_device
            return inner(variables, normalize_on_device(x, "mask_rcnn"))

        self._infer = jax.jit(infer_u8)

    def _preprocess(self, image_rgb: np.ndarray):
        """Returns (x[None], (fx, fy)) where model-coord boxes map back to
        the original image as box * (fx, fy, fx, fy). Output stays uint8 —
        the reference predictor resizes a PIL image (8-bit, BICUBIC,
        inst_model/Mask_RCNN/mask_rcnn.py:143-150), so the quantized
        boundary matches its numerics; normalization runs on device."""
        import cv2
        from instancesegmentation_tpu.data.loader import quantize_uint8
        h, w = image_rgb.shape[:2]
        img_u8 = quantize_uint8(image_rgb)
        if self.buckets is not None:
            from instancesegmentation_tpu.data.aspect_ratio import \
                nearest_bucket
            th, tw = nearest_bucket(h, w, self.buckets)
            s = min(th / h, tw / w)
            nh, nw = max(1, int(round(h * s))), max(1, int(round(w * s)))
            resized = cv2.resize(img_u8, (nw, nh),
                                 interpolation=cv2.INTER_CUBIC)
            canvas = np.full((th, tw, 3), 128, np.uint8)      # gray pad,
            canvas[:nh, :nw] = resized        # top-left like training
            x = canvas
            scale = (w / nw, h / nh)
        else:
            ih, iw = self.input_shape
            x = cv2.resize(img_u8, (iw, ih),
                           interpolation=cv2.INTER_CUBIC)
            scale = (w / iw, h / ih)
        return x[None], scale

    def _finish(self, dets_i, probs_i, orig_hw, thresh, scale):
        """Host-side finishing for ONE image: threshold, rescale boxes to
        the original resolution (un-pads keep-aspect inputs by
        construction), paste 28^2 mask probs (transform.py:388-418)."""
        h, w = orig_hw
        fx, fy = scale
        valid = dets_i["valid"] & (dets_i["scores"] >= thresh)
        boxes = dets_i["boxes"][valid]
        boxes = boxes * np.array([fx, fy, fx, fy], np.float32)
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        scores = dets_i["scores"][valid]
        labels = dets_i["labels"][valid]                    # 1..K
        probs = probs_i[valid]                              # (N, 28, 28)
        masks = np.stack([paste_mask(p, b, h, w)
                          for p, b in zip(probs, boxes)]) \
            if len(boxes) else np.zeros((0, h, w), bool)
        return {"boxes": boxes, "scores": scores,
                "classes": labels - 1, "masks": masks}

    def reset_pool_stats(self):
        """Start a fresh saturation measurement (evaluate_predictor calls
        this per eval so repeated evals don't report cumulative counts)."""
        self.pool_stats = {"max": 0, "mean": 0.0, "images": 0, "saturated": 0}

    def _track_pool(self, n_candidates: np.ndarray):
        """Running max/mean of per-image above-threshold candidate counts
        vs the static pool (a saturated pool silently drops candidates
        pre-NMS, unlike torchvision's dynamic filter, roi_head.py:441-445)."""
        if not len(n_candidates):
            return
        st = self.pool_stats
        n = st["images"]
        st["max"] = max(st["max"], int(n_candidates.max()))
        st["mean"] = (st["mean"] * n + float(n_candidates.sum())) \
            / (n + len(n_candidates))
        st["images"] = n + len(n_candidates)
        if self.pool_size:
            st["saturated"] += int((n_candidates > self.pool_size).sum())

    def raw_detect(self, image_rgb: np.ndarray, score_thresh=None):
        return self.raw_detect_batch([image_rgb], score_thresh)[0]

    def raw_detect_batch(self, images_rgb, score_thresh=None, n_valid=None):
        """Batched inference: one device dispatch per chunk (the eval
        throughput path). A new batch size triggers one extra compile;
        under buckets, images are grouped by their assigned bucket shape
        (one dispatch per bucket present in the chunk).

        ``n_valid``: only rows ``< n_valid`` are real images — eval pads
        tail chunks by repeating the last image so only one graph shape
        compiles; the duplicates must not enter the pool-saturation
        stats (they would inflate image counts and double-count a
        saturated final image)."""
        thresh = self.confidence if score_thresh is None else score_thresh
        if n_valid is None:
            n_valid = len(images_rgb)
        preps = [self._preprocess(im) for im in images_rgb]
        groups = {}
        for i, (x, _) in enumerate(preps):
            groups.setdefault(x.shape[1:3], []).append(i)
        out = [None] * len(images_rgb)
        for idxs in groups.values():
            batch = np.concatenate([preps[i][0] for i in idxs])
            dets, mask_probs = self._infer(self.variables, batch)
            if dets.n_candidates is not None:
                real = np.asarray(idxs) < n_valid
                self._track_pool(np.asarray(dets.n_candidates)[real])
            dets = {"boxes": np.asarray(dets.boxes),
                    "scores": np.asarray(dets.scores),
                    "labels": np.asarray(dets.labels),
                    "valid": np.asarray(dets.valid)}
            mask_probs = np.asarray(mask_probs)
            for k, i in enumerate(idxs):
                out[i] = self._finish(
                    {key: v[k] for key, v in dets.items()}, mask_probs[k],
                    images_rgb[i].shape[:2], thresh, preps[i][1])
        return out

    # -- reference API ---------------------------------------------------
    def detect_image(self, image_rgb: np.ndarray) -> np.ndarray:
        import cv2
        det = self.raw_detect(image_rgb)
        out = image_rgb.astype(np.uint8).copy()
        overlay = out.copy()
        for i in range(len(det["scores"])):
            color = self.colors[int(det["classes"][i]) % len(self.colors)]
            overlay[det["masks"][i]] = color
        out = cv2.addWeighted(overlay, 0.4, out, 0.6, 0)
        for i in range(len(det["scores"])):
            x1, y1, x2, y2 = det["boxes"][i].astype(int)
            cls = int(det["classes"][i])
            color = self.colors[cls % len(self.colors)]
            cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
            cv2.putText(out, f"{self.class_names[cls]} {det['scores'][i]:.2f}",
                        (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, color, 1, cv2.LINE_AA)
        return out

    def get_FPS(self, image_rgb: np.ndarray, test_interval: int = 100) -> float:
        batch, _ = self._preprocess(image_rgb)
        dets, probs = self._infer(self.variables, batch)
        np.asarray(dets.scores)   # host sync (see yolact predictor note)
        t0 = time.time()
        for _ in range(test_interval):
            dets, probs = self._infer(self.variables, batch)
        np.asarray(dets.scores)
        return (time.time() - t0) / test_interval

    def get_map_out(self, image_rgb: np.ndarray):
        det = self.raw_detect(image_rgb, score_thresh=0.0)
        return (det["boxes"], det["scores"], det["classes"], det["masks"])

    def get_map_out_batch(self, images_rgb, n_valid=None):
        dets = self.raw_detect_batch(images_rgb, score_thresh=0.0,
                                     n_valid=n_valid)
        return [(d["boxes"], d["scores"], d["classes"], d["masks"])
                for d in dets]
