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


class _GtOracle:
    """Predictor stub returning ground truth; counts batch dispatches."""

    def __init__(self, ds):
        self.ds = ds
        self.calls = 0

    def get_map_out_batch(self, images, n_valid=None):
        # n_valid marks the tail-padding boundary (predictor API); the
        # oracle has no per-image stats to exclude
        self.calls += 1
        outs = []
        for img in images:
            idx = self._index_of(img)
            s = self.ds.raw_item(idx)
            h, w = s["image"].shape[:2]
            boxes = s["boxes"] * np.array([w, h, w, h], np.float32)
            outs.append((boxes, np.ones(len(s["labels"]), np.float32),
                         s["labels"], s["masks"]))
        return outs

    def _index_of(self, img):
        for i in range(len(self.ds)):
            if np.array_equal(self.ds.raw_item(i)["image"], img):
                return i
        raise AssertionError("unknown image")


def test_evaluate_predictor_batched_and_sharded(synth, tmp_path):
    """Drive evaluate_predictor end-to-end: gt-oracle predictor, batch
    chunking with a padded tail, two simulated hosts merged with image-id
    dedup -> mAP 1.0 and every image id present exactly once."""
    from instancesegmentation_tpu.data.eval_runner import evaluate_predictor
    from instancesegmentation_tpu.parallel.multihost import \
        merge_eval_results

    ds = SegDataset(synth.val_image_path, synth.val_coco, synth.label_map)
    oracle = _GtOracle(ds)

    # ---- single host, batch=4 over 6 images (padded tail chunk) --------
    stats = evaluate_predictor(oracle, ds, synth.label_map, str(tmp_path),
                               map_mode=0, batch_size=4)
    assert oracle.calls == 2           # ceil(6/4) dispatches
    assert stats[0][0] == pytest.approx(1.0, abs=0.01)
    assert stats[1][0] == pytest.approx(1.0, abs=0.01)
    bbox = json.load(open(tmp_path / "bbox_detections.json"))
    assert sorted({e["image_id"] for e in bbox}) == sorted(ds.ids)

    # ---- two simulated hosts with an overlapping image ------------------
    r0 = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5], "score": .9},
          {"image_id": 2, "category_id": 1, "bbox": [0, 0, 5, 5], "score": .8}]
    r1 = [{"image_id": 2, "category_id": 2, "bbox": [1, 1, 6, 6], "score": .7},
          {"image_id": 3, "category_id": 1, "bbox": [2, 2, 7, 7], "score": .6}]

    def gather(_):
        return [(0, r0), (1, r1)]
    merged = merge_eval_results(r0, _gather=gather)
    # image 2 present from rank 0 ONLY (image-level dedup, coco_eval.py:11-31)
    ids = [(m["image_id"], m["category_id"]) for m in merged]
    assert ids == [(1, 1), (2, 1), (3, 1)]


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
