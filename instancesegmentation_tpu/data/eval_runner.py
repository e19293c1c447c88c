"""COCO-eval glue: detection JSON writer + the eval loop.

Ports the reference's Make_json / prep_metrics
(/root/reference/inst_model/yolact/utils/utils_map.py:8-62) and the
eval.py driver loop (:58-96): first N val images, get_map_out per image,
bbox + segm detection JSONs, then COCOeval twice.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from instancesegmentation_tpu.data import rle
from instancesegmentation_tpu.data.coco import COCO
from instancesegmentation_tpu.data.coco_eval import COCOeval


class MakeJson:
    """Accumulate detections in COCO results format (utils_map.py:8-54)."""

    def __init__(self, label_map: Dict[int, int]):
        # label_map: category_id -> contiguous 1-based; invert it
        self.coco_cats = {v - 1: k for k, v in label_map.items()}
        self.bbox_data: List[Dict] = []
        self.mask_data: List[Dict] = []

    def add_bbox(self, image_id: int, cls: int, box_xyxy, score: float):
        x1, y1, x2, y2 = box_xyxy
        bbox = [float(x1), float(y1), float(x2 - x1), float(y2 - y1)]
        bbox = [round(b * 10) / 10 for b in bbox]        # utils_map.py:27
        self.bbox_data.append({
            "image_id": int(image_id),
            "category_id": self.coco_cats[int(cls)],
            "bbox": bbox, "score": float(score)})

    def add_mask(self, image_id: int, cls: int, mask: np.ndarray, score: float):
        self.mask_data.append({
            "image_id": int(image_id),
            "category_id": self.coco_cats[int(cls)],
            "segmentation": rle.encode(mask.astype(np.uint8)),
            "score": float(score)})

    def prep_metrics(self, image_id: int, boxes, scores, classes, masks):
        """Filter zero-area boxes and record both forms (utils_map.py:56-62)."""
        for i in range(len(scores)):
            x1, y1, x2, y2 = boxes[i]
            if (x2 - x1) * (y2 - y1) <= 0:
                continue
            self.add_bbox(image_id, classes[i], boxes[i], scores[i])
            self.add_mask(image_id, classes[i], masks[i], scores[i])

    def dump(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        paths = (os.path.join(out_dir, "bbox_detections.json"),
                 os.path.join(out_dir, "mask_detections.json"))
        for path, data in zip(paths, (self.bbox_data, self.mask_data)):
            with open(path, "w") as f:
                json.dump(data, f)
        return paths


def run_coco_eval(gt: COCO, bbox_json: str, mask_json: str,
                  img_ids: Optional[Sequence[int]] = None):
    """COCOeval bbox then segm (eval.py:82-96). Returns (bbox_stats, mask_stats)."""
    out = []
    for iou_type, path in (("bbox", bbox_json), ("segm", mask_json)):
        print(f"\nEvaluating {iou_type.upper()}:")
        dt = gt.loadRes(path)
        ev = COCOeval(gt, dt, iou_type)
        if img_ids is not None:
            ev.params.imgIds = list(img_ids)
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        out.append(ev.stats)
    return tuple(out)


def evaluate_predictor(predictor, dataset, label_map, out_dir: str,
                       max_images: int = 100, map_mode: int = 0,
                       batch_size: int = 8, _multihost=None):
    """Full eval driver (eval.py:31-96). map_mode: 0=predict+metrics,
    1=predict only, 2=metrics only. Returns stats or None.

    Throughput: images run through ``get_map_out_batch`` in chunks of
    ``batch_size`` (tail chunks padded by repetition so only one graph is
    compiled). Multi-host: each process takes a strided shard of the image
    ids, results are merged rank-0-side with image-id dedup and only the
    main process dumps/evaluates (the reference's EvalCOCOMetric path,
    annotation/train_utils/coco_eval.py:146-163). ``_multihost`` is
    injectable for tests."""
    mh = _multihost
    if mh is None:
        from instancesegmentation_tpu.parallel import multihost as mh
    ids = dataset.ids[:max_images]
    bbox_json = os.path.join(out_dir, "bbox_detections.json")
    mask_json = os.path.join(out_dir, "mask_detections.json")

    if map_mode in (0, 1):
        mj = MakeJson(label_map)
        local_ids = ids[mh.process_rank()::mh.world_size()]
        if hasattr(predictor, "reset_pool_stats"):
            # fresh saturation stats per eval (repeated in-training evals
            # must not report cumulative counts)
            predictor.reset_pool_stats()
        if hasattr(predictor, "get_map_out_batch"):
            for i in range(0, len(local_ids), batch_size):
                chunk = local_ids[i:i + batch_size]
                images = [dataset.load_image(im_id) for im_id in chunk]
                padded = images + [images[-1]] * (batch_size - len(images))
                outs = predictor.get_map_out_batch(
                    padded, n_valid=len(chunk))[:len(chunk)]
                for image_id, (boxes, scores, classes, masks) in zip(chunk,
                                                                     outs):
                    mj.prep_metrics(image_id, boxes, scores, classes, masks)
        else:
            for image_id in local_ids:
                image = dataset.load_image(image_id)
                boxes, scores, classes, masks = predictor.get_map_out(image)
                mj.prep_metrics(image_id, boxes, scores, classes, masks)
        mj.bbox_data = mh.merge_eval_results(mj.bbox_data)
        mj.mask_data = mh.merge_eval_results(mj.mask_data)
        # box-head pool saturation (Mask R-CNN predictors track it; this
        # host's images only): overflow means the static candidate pool
        # diverged from reference semantics for those images
        ps = getattr(predictor, "pool_stats", None)
        if ps and ps.get("images"):
            pool = getattr(predictor, "pool_size", 0)
            warn = (f"  [{ps['saturated']} image(s) SATURATED — raise "
                    f"box_nms_candidates]" if ps["saturated"] else "")
            print(f"box-head NMS candidates: max {ps['max']} / "
                  f"mean {ps['mean']:.1f} of {pool} pool slots "
                  f"over {ps['images']} image(s){warn}")
        if mh.is_main_process():
            mj.dump(out_dir)
    if map_mode in (0, 2) and mh.is_main_process():
        return run_coco_eval(dataset.coco, bbox_json, mask_json, img_ids=ids)
    return None
