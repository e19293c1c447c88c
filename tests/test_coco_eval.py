import numpy as np
import pytest

from instancesegmentation_tpu.data import rle
from instancesegmentation_tpu.data.coco import COCO
from instancesegmentation_tpu.data.coco_eval import COCOeval


def _gt(boxes_by_img, hw=(100, 100)):
    """boxes_by_img: {img_id: [(x,y,w,h,cat), ...]}"""
    images, anns = [], []
    aid = 1
    for img_id, boxes in boxes_by_img.items():
        images.append({"id": img_id, "height": hw[0], "width": hw[1],
                       "file_name": f"{img_id}.png"})
        for (x, y, w, h, c) in boxes:
            m = np.zeros(hw, np.uint8)
            m[int(y):int(y + h), int(x):int(x + w)] = 1
            anns.append({"id": aid, "image_id": img_id, "category_id": c,
                         "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                         "segmentation": rle.encode(m)})
            aid += 1
    return COCO({"images": images, "annotations": anns,
                 "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]})


def _det(img_id, x, y, w, h, c, score, hw=(100, 100)):
    m = np.zeros(hw, np.uint8)
    m[int(y):int(y + h), int(x):int(x + w)] = 1
    return {"image_id": img_id, "category_id": c, "bbox": [x, y, w, h],
            "score": score, "segmentation": rle.encode(m)}


def _run(gt, dets, iou_type="bbox"):
    ev = COCOeval(gt, gt.loadRes(dets), iou_type)
    ev.evaluate()
    ev.accumulate()
    import contextlib, io
    with contextlib.redirect_stdout(io.StringIO()):
        ev.summarize()
    return ev.stats


def test_perfect_detection_ap1():
    gt = _gt({1: [(10, 10, 30, 40, 1)]})
    dets = [_det(1, 10, 10, 30, 40, 1, 0.9)]
    for iou_type in ("bbox", "segm"):
        stats = _run(gt, dets, iou_type)
        assert stats[0] == pytest.approx(1.0), (iou_type, stats)
        assert stats[1] == pytest.approx(1.0)


def test_miss_gives_zero():
    gt = _gt({1: [(10, 10, 30, 40, 1)]})
    stats = _run(gt, [_det(1, 60, 60, 20, 20, 1, 0.9)])
    assert stats[0] == pytest.approx(0.0)


def test_partial_iou_counts_fraction_of_thresholds():
    # det shifted: gt (0,0,10,10), det (0,0,10,8) -> IoU = 0.8
    gt = _gt({1: [(0, 0, 10, 10, 1)]})
    stats = _run(gt, [_det(1, 0, 0, 10, 8, 1, 0.9)])
    # matches at thresholds 0.50..0.80 -> 7 of 10
    assert stats[0] == pytest.approx(0.7, abs=1e-6)
    assert stats[1] == pytest.approx(1.0)   # AP@0.5


def test_false_positive_lowers_precision():
    gt = _gt({1: [(10, 10, 30, 40, 1)]})
    dets = [_det(1, 10, 10, 30, 40, 1, 0.8),
            _det(1, 60, 60, 20, 20, 1, 0.9)]   # higher-scored FP
    stats = _run(gt, dets)
    # 101-pt AP with precision 0.5 across all recall = 0.5
    assert stats[1] == pytest.approx(0.5, abs=0.01)


def test_wrong_class_is_fp():
    gt = _gt({1: [(10, 10, 30, 40, 1)]})
    stats = _run(gt, [_det(1, 10, 10, 30, 40, 2, 0.9)])
    assert stats[0] == pytest.approx(0.0)


def test_crowd_gt_not_counted_and_matches_ignored():
    gt = _gt({1: [(10, 10, 30, 40, 1)]})
    gt.dataset["annotations"][0]["iscrowd"] = 1
    gt = COCO(gt.dataset)
    stats = _run(gt, [_det(1, 10, 10, 30, 40, 1, 0.9)])
    assert stats[0] == pytest.approx(-1.0)   # no non-ignored gt -> undefined


def test_two_images_multi_class():
    gt = _gt({1: [(10, 10, 30, 40, 1), (50, 50, 20, 20, 2)],
              2: [(0, 0, 50, 50, 1)]})
    dets = [_det(1, 10, 10, 30, 40, 1, 0.9),
            _det(1, 50, 50, 20, 20, 2, 0.8),
            _det(2, 0, 0, 50, 50, 1, 0.95)]
    stats = _run(gt, dets)
    assert stats[0] == pytest.approx(1.0)
    stats_m = _run(gt, dets, "segm")
    assert stats_m[0] == pytest.approx(1.0)


def test_area_ranges():
    # small object (16x16=256 < 1024) only
    gt = _gt({1: [(10, 10, 16, 16, 1)]})
    dets = [_det(1, 10, 10, 16, 16, 1, 0.9)]
    ev = COCOeval(gt, gt.loadRes(dets), "bbox")
    ev.evaluate()
    ev.accumulate()
    import contextlib, io
    with contextlib.redirect_stdout(io.StringIO()):
        ev.summarize()
    assert ev.stats[3] == pytest.approx(1.0)    # AP small
    assert ev.stats[4] == pytest.approx(-1.0)   # AP medium: none


def test_crowd_rematch_absorbs_extra_detection():
    """pycocotools: a crowd gt can match MULTIPLE detections, each becoming
    ignored — a second overlapping det must not count as FP."""
    gt = _gt({1: [(10, 10, 30, 40, 1), (60, 60, 30, 30, 1)]})
    gt.dataset["annotations"][1]["iscrowd"] = 1
    gt = COCO(gt.dataset)
    dets = [_det(1, 10, 10, 30, 40, 1, 0.9),    # TP on the regular gt
            _det(1, 60, 60, 30, 30, 1, 0.95),   # absorbed by crowd
            _det(1, 62, 62, 26, 26, 1, 0.93)]   # inside crowd: crowd-IoU
                                                # (inter/dt area) = 1, ALSO
                                                # absorbed via re-match
    stats = _run(gt, dets)
    assert stats[0] == pytest.approx(1.0)       # no FP: precision stays 1

    # sanity: without crowd both extra dets are FPs
    gt2 = _gt({1: [(10, 10, 30, 40, 1)]})
    stats2 = _run(gt2, dets)
    assert stats2[0] < 0.7


def test_regular_gt_preferred_over_crowd():
    """The matching loop prefers a regular gt even when a crowd gt has
    HIGHER IoU (pycocotools breaks at the ignore boundary only after a
    regular match exists; crowd gts sort last)."""
    gt = _gt({1: [(10, 10, 30, 30, 1), (10, 10, 32, 32, 1)]})
    gt.dataset["annotations"][1]["iscrowd"] = 1
    gt = COCO(gt.dataset)
    dets = [_det(1, 10, 10, 32, 32, 1, 0.9)]    # exact crowd, 0.88 regular
    stats = _run(gt, dets)
    # matched to the regular gt -> counts as TP at IoU thresholds it passes
    assert stats[1] == pytest.approx(1.0)       # AP@0.5


def test_maxdet_truncation_ar1():
    """AR@1 keeps only the highest-scored det per image — the lower-scored
    true positive must be dropped by the [:maxDet] slice in accumulate."""
    gt = _gt({1: [(10, 10, 30, 40, 1), (60, 60, 20, 20, 1)]})
    dets = [_det(1, 10, 10, 30, 40, 1, 0.9),
            _det(1, 60, 60, 20, 20, 1, 0.8)]
    stats = _run(gt, dets)
    assert stats[8] == pytest.approx(1.0)       # AR@100: both found
    assert stats[6] == pytest.approx(0.5)       # AR@1: one det allowed


def test_loadres_multiregion_rle_area():
    """loadRes must set a segm result's area to the MASK area (pycocotools
    always recomputes; a two-blob mask's area != its bbox area)."""
    gt = _gt({1: [(10, 10, 10, 10, 1)]})
    m = np.zeros((100, 100), np.uint8)
    m[10:20, 10:20] = 1                          # blob A (100 px)
    m[40:50, 40:50] = 1                          # blob B (100 px)
    det = {"image_id": 1, "category_id": 1, "score": 0.9,
           "segmentation": rle.encode(m), "area": 999999.0}  # stale area
    res = gt.loadRes([det])
    ann = res.dataset["annotations"][0]
    assert ann["area"] == pytest.approx(200.0)   # mask area, not 40*40 bbox
    assert ann["bbox"] == [10.0, 10.0, 40.0, 40.0]

    # bbox results: area always w*h, ignoring any provided value
    res2 = gt.loadRes([{"image_id": 1, "category_id": 1, "score": 0.9,
                        "bbox": [10, 10, 10, 10], "area": 5.0}])
    assert res2.dataset["annotations"][0]["area"] == pytest.approx(100.0)


# ---------------------------------------------------------------------------
# Protocol-invariance properties (drift guards: pycocotools is absent in
# this image, so these pin the published protocol's structural behaviors)
# ---------------------------------------------------------------------------


def test_score_monotone_transform_invariance():
    """AP depends only on score RANKS: any strictly monotone transform of
    the scores must leave every stat unchanged."""
    gt = _gt({1: [(10, 10, 30, 40, 1), (60, 60, 20, 20, 2)],
              2: [(5, 5, 40, 40, 1)]})
    dets = [_det(1, 10, 10, 30, 40, 1, 0.9),
            _det(1, 58, 60, 22, 20, 2, 0.6),
            _det(2, 5, 8, 40, 37, 1, 0.4),
            _det(2, 50, 50, 20, 20, 1, 0.2)]
    base = _run(gt, [dict(d) for d in dets])
    squeezed = []
    for d in dets:
        d2 = dict(d)
        d2["score"] = 0.05 + 0.01 * d["score"] ** 3     # monotone
        squeezed.append(d2)
    trans = _run(gt, squeezed)
    np.testing.assert_allclose(np.nan_to_num(base, nan=-1),
                               np.nan_to_num(trans, nan=-1))


def test_duplicate_detections_never_raise_ap():
    """Duplicating detections adds unmatched FPs: AP must be monotonically
    non-increasing in the number of duplicates. Trailing dups (below the
    last TP's score) leave AP EXACTLY unchanged — interpolated precision
    takes the max over operating points at recall >= r, and recall already
    saturated — while a dup interleaved BEFORE a TP strictly lowers AP."""
    gt = _gt({1: [(10, 10, 30, 40, 1)]})
    dets = [_det(1, 10, 10, 30, 40, 1, 0.9)]
    base = _run(gt, [dict(d) for d in dets])
    assert base[0] == pytest.approx(1.0)
    dup = [dict(dets[0])]
    prev = base[0]
    for k in range(1, 4):
        d2 = dict(dets[0])
        d2["score"] = 0.9 - 0.1 * k
        dup.append(d2)
        ap = _run(gt, [dict(d) for d in dup])[0]
        assert ap <= prev + 1e-9, (k, ap, prev)
        prev = ap
    # trailing dups: recall hit 1.0 at rank 1, so interpolated AP is intact
    assert prev == pytest.approx(base[0])

    # interleaved dup: TP(gt1)@0.9, dup-FP@0.8, TP(gt2)@0.7 — the second
    # half of the recall range now carries precision 2/3 < 1
    gt2 = _gt({1: [(10, 10, 30, 40, 1), (60, 60, 20, 20, 1)]})
    clean = [_det(1, 10, 10, 30, 40, 1, 0.9),
             _det(1, 60, 60, 20, 20, 1, 0.7)]
    ap_clean = _run(gt2, [dict(d) for d in clean])[0]
    mid_dup = clean[:1] + [dict(clean[0], score=0.8)] + clean[1:]
    ap_dup = _run(gt2, [dict(d) for d in mid_dup])[0]
    assert ap_clean == pytest.approx(1.0)
    assert ap_dup < ap_clean - 1e-6


def test_crowd_gt_never_counts_as_fp():
    """A detection overlapping only a CROWD gt is IGNORED, not a false
    positive (the crowd re-match semantics): AP for the non-crowd gt must
    be unaffected by the extra crowd-hitting detection."""
    hw = (100, 100)
    images = [{"id": 1, "height": 100, "width": 100, "file_name": "1.png"}]
    m_normal = np.zeros(hw, np.uint8)
    m_normal[10:50, 10:40] = 1
    m_crowd = np.zeros(hw, np.uint8)
    m_crowd[60:95, 60:95] = 1
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 40],
         "area": 1200, "iscrowd": 0, "segmentation": rle.encode(m_normal)},
        {"id": 2, "image_id": 1, "category_id": 1, "bbox": [60, 60, 35, 35],
         "area": 1225, "iscrowd": 1, "segmentation": rle.encode(m_crowd)},
    ]
    gt = COCO({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]})
    clean = [_det(1, 10, 10, 30, 40, 1, 0.9)]
    with_crowd_hit = clean + [_det(1, 62, 62, 30, 30, 1, 0.5)]
    for iou_type in ("bbox", "segm"):
        ap_clean = _run(gt, [dict(d) for d in clean], iou_type)[0]
        ap_crowd = _run(gt, [dict(d) for d in with_crowd_hit], iou_type)[0]
        assert ap_clean == pytest.approx(1.0)
        assert ap_crowd == pytest.approx(ap_clean), iou_type


def test_ar_monotone_in_maxdets():
    """AR@maxDets=1 <= AR@maxDets=10 <= AR@maxDets=100 (truncation can
    only lose recall). Stats 6/7/8 are AR at maxDets 1/10/100."""
    gt = _gt({1: [(10, 10, 30, 40, 1), (60, 60, 20, 20, 1),
                  (5, 60, 20, 30, 1)]})
    dets = [_det(1, 10, 10, 30, 40, 1, 0.9),
            _det(1, 60, 61, 20, 19, 1, 0.7),
            _det(1, 5, 60, 20, 30, 1, 0.5)]
    stats = _run(gt, dets)
    ar1, ar10, ar100 = stats[6], stats[7], stats[8]
    assert ar1 <= ar10 + 1e-9 and ar10 <= ar100 + 1e-9, (ar1, ar10, ar100)
    assert ar1 < ar100          # 3 gts, top-1 truncation must lose recall
