"""Eval-protocol round trip: feeding ground truth back as detections
through MakeJson + COCOeval must score mAP 1.0 — catches format drift
between the writer (xywh rounding, RLE, category mapping) and the
evaluator."""

import json

import numpy as np
import pytest

from instancesegmentation_tpu.data.datasets import SegDataset, synthetic_annotation
from instancesegmentation_tpu.data.eval_runner import MakeJson, run_coco_eval


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_eval")
    return synthetic_annotation(str(root), num_images=6, image_size=96)


def test_gt_as_detections_scores_perfectly(synth, tmp_path):
    ds = SegDataset(synth.val_image_path, synth.val_coco, synth.label_map)
    mj = MakeJson(synth.label_map)
    for image_id in ds.ids:
        s = ds.raw_item(ds.ids.index(image_id))
        h, w = s["image"].shape[:2]
        boxes_px = s["boxes"] * np.array([w, h, w, h], np.float32)
        scores = np.ones(len(s["labels"]), np.float32)
        mj.prep_metrics(image_id, boxes_px, scores, s["labels"], s["masks"])
    bbox_json, mask_json = mj.dump(str(tmp_path))

    bbox_stats, mask_stats = run_coco_eval(synth.val_coco, bbox_json,
                                           mask_json, img_ids=ds.ids)
    assert bbox_stats[0] == pytest.approx(1.0, abs=0.01)
    assert mask_stats[0] == pytest.approx(1.0, abs=0.01)


def test_makejson_format(synth, tmp_path):
    mj = MakeJson(synth.label_map)
    mask = np.zeros((96, 96), np.uint8)
    mask[10:20, 10:30] = 1
    mj.prep_metrics(1, np.array([[10.0, 10.0, 30.0, 20.0]]),
                    np.array([0.73]), np.array([1]), mask[None])
    # zero-area boxes filtered (utils_map.py:56-62)
    mj.prep_metrics(1, np.array([[5.0, 5.0, 5.0, 9.0]]),
                    np.array([0.9]), np.array([0]), mask[None])
    bbox_json, mask_json = mj.dump(str(tmp_path))
    bbox = json.load(open(bbox_json))
    segm = json.load(open(mask_json))
    assert len(bbox) == 1 and len(segm) == 1
    e = bbox[0]
    assert e["image_id"] == 1 and e["score"] == pytest.approx(0.73)
    assert e["bbox"] == [10.0, 10.0, 20.0, 10.0]          # xywh, .1 rounding
    # contiguous class 1 -> its original category id
    assert e["category_id"] == {v: k for k, v in synth.label_map.items()}[2]
    assert segm[0]["segmentation"]["size"] == [96, 96]
