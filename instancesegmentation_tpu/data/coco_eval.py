"""COCO mAP evaluation (bbox + segm) — from-scratch numpy implementation.

The environment has no pycocotools, so this implements the standard COCO
evaluation protocol the reference relies on (eval.py:82-96): greedy
score-descending matching per (image, category) at IoU thresholds
.50:.05:.95, crowd/ignore handling, area ranges, maxDets {1,10,100},
101-point interpolated precision, and the 12 standard summary metrics.
``stats`` has the same layout as pycocotools' COCOeval.stats.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from instancesegmentation_tpu.data import rle
from instancesegmentation_tpu.data.coco import COCO


class Params:
    def __init__(self, iouType: str = "bbox"):
        self.iouType = iouType
        self.imgIds: List[int] = []
        self.catIds: List[int] = []
        self.iouThrs = np.linspace(0.5, 0.95, 10)
        self.recThrs = np.linspace(0.0, 1.00, 101)
        self.maxDets = [1, 10, 100]
        self.areaRng = [[0.0, 1e10], [0.0, 32.0 ** 2],
                        [32.0 ** 2, 96.0 ** 2], [96.0 ** 2, 1e10]]
        self.areaRngLbl = ["all", "small", "medium", "large"]
        self.useCats = 1


def _bbox_iou(dts: np.ndarray, gts: np.ndarray, iscrowd) -> np.ndarray:
    """xywh pairwise IoU; crowd gt -> intersection / dt area."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    dx1, dy1 = dts[:, 0], dts[:, 1]
    dx2, dy2 = dts[:, 0] + dts[:, 2], dts[:, 1] + dts[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    iw = np.clip(np.minimum(dx2[:, None], gx2[None, :])
                 - np.maximum(dx1[:, None], gx1[None, :]), 0, None)
    ih = np.clip(np.minimum(dy2[:, None], gy2[None, :])
                 - np.maximum(dy1[:, None], gy1[None, :]), 0, None)
    inter = iw * ih
    darea = (dts[:, 2] * dts[:, 3])[:, None]
    garea = (gts[:, 2] * gts[:, 3])[None, :]
    crowd = np.asarray(iscrowd, bool)[None, :]
    denom = np.where(crowd, darea, darea + garea - inter)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, inter / denom, 0.0)


class COCOeval:
    def __init__(self, cocoGt: COCO, cocoDt: COCO, iouType: str = "bbox"):
        assert iouType in ("bbox", "segm")
        self.cocoGt = cocoGt
        self.cocoDt = cocoDt
        self.params = Params(iouType)
        self.params.imgIds = sorted(cocoGt.getImgIds())
        self.params.catIds = sorted(cocoGt.getCatIds())
        self.evalImgs: Dict = {}
        self.eval: Dict = {}
        self.stats = np.zeros(12)
        self.ious: Dict = {}

    # ------------------------------------------------------------------
    def _gts_dts(self):
        p = self.params
        gts = defaultdict(list)
        dts = defaultdict(list)
        for img_id in p.imgIds:
            for ann in self.cocoGt.imgToAnns.get(img_id, []):
                gts[img_id, ann["category_id"]].append(ann)
            for ann in self.cocoDt.imgToAnns.get(img_id, []):
                dts[img_id, ann["category_id"]].append(ann)
        return gts, dts

    def compute_iou(self, gt_anns, dt_anns) -> np.ndarray:
        p = self.params
        dt_anns = sorted(dt_anns, key=lambda d: -d["score"])[:p.maxDets[-1]]
        if p.iouType == "bbox":
            d = np.array([dt["bbox"] for dt in dt_anns], np.float64).reshape(-1, 4)
            g = np.array([gt["bbox"] for gt in gt_anns], np.float64).reshape(-1, 4)
            return _bbox_iou(d, g, [gt.get("iscrowd", 0) for gt in gt_anns])
        # segm: RLE mask IoU (gt polygons rasterized on demand)
        if not gt_anns and not dt_anns:
            return np.zeros((0, 0))
        img = self.cocoGt.imgs[gt_anns[0]["image_id"]] if gt_anns else \
            self.cocoDt.imgs[dt_anns[0]["image_id"]]
        h, w = img["height"], img["width"]

        def to_rle(ann):
            seg = ann.get("segmentation")
            # compressed OR uncompressed RLE dicts pass straight through
            # (iou_rle handles both count forms); only polygons rasterize
            if isinstance(seg, dict) and "counts" in seg:
                return seg
            return rle.encode(rle.ann_to_mask(ann, h, w))
        d = [to_rle(x) for x in dt_anns]
        g = [to_rle(x) for x in gt_anns]
        return rle.iou_rle(d, g, [gt.get("iscrowd", 0) for gt in gt_anns])

    def evaluate_img(self, gt_anns, dt_anns, ious, area_rng, max_det):
        p = self.params
        t = len(p.iouThrs)
        gt_anns = list(gt_anns)
        dt_anns = sorted(dt_anns, key=lambda d: -d["score"])[:max_det]

        gt_ig = np.array([
            1 if (g.get("iscrowd", 0)
                  or g.get("ignore", 0)
                  or g["area"] < area_rng[0] or g["area"] > area_rng[1])
            else 0 for g in gt_anns], np.int32)
        # sort gts: non-ignored first (stable), like pycocotools
        gt_order = np.argsort(gt_ig, kind="stable")
        gt_anns = [gt_anns[i] for i in gt_order]
        gt_ig = gt_ig[gt_order]
        iou = ious[:, gt_order] if ious.size else ious

        ng, nd = len(gt_anns), len(dt_anns)
        gtm = -np.ones((t, ng), np.int64)
        dtm = -np.ones((t, nd), np.int64)
        dt_ig = np.zeros((t, nd), np.int32)

        for ti, thr in enumerate(p.iouThrs):
            for di in range(nd):
                best = min(thr, 1 - 1e-10)
                m = -1
                for gi in range(ng):
                    if gtm[ti, gi] >= 0 and not gt_anns[gi].get("iscrowd", 0):
                        continue                     # gt already taken
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gi] == 1:
                        break                        # rest are all ignored
                    if iou[di, gi] < best:
                        continue
                    best = iou[di, gi]
                    m = gi
                if m == -1:
                    continue
                dt_ig[ti, di] = gt_ig[m]
                dtm[ti, di] = m
                gtm[ti, m] = di
        # unmatched dts outside the area range are ignored
        a = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1]
                      for d in dt_anns]).reshape(1, -1)
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == -1,
                                                    np.repeat(a, t, 0)))
        return {
            "dtMatches": dtm, "dtScores": [d["score"] for d in dt_anns],
            "gtIgnore": gt_ig, "dtIgnore": dt_ig,
        }

    # ------------------------------------------------------------------
    def evaluate(self):
        p = self.params
        gts, dts = self._gts_dts()
        self.ious = {
            (i, c): self.compute_iou(gts[i, c], dts[i, c])
            for i in p.imgIds for c in p.catIds}
        self.evalImgs = {}
        for c in p.catIds:
            for ai, arng in enumerate(p.areaRng):
                for i in p.imgIds:
                    g, d = gts[i, c], dts[i, c]
                    if not g and not d:
                        self.evalImgs[i, c, ai] = None
                        continue
                    self.evalImgs[i, c, ai] = self.evaluate_img(
                        g, d, self.ious[i, c], arng, p.maxDets[-1])

    def accumulate(self):
        p = self.params
        T, R = len(p.iouThrs), len(p.recThrs)
        K, A, M = len(p.catIds), len(p.areaRng), len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        for ki, c in enumerate(p.catIds):
            for ai in range(A):
                ev = [self.evalImgs.get((i, c, ai)) for i in p.imgIds]
                ev = [e for e in ev if e is not None]
                if not ev:
                    continue
                for mi, max_det in enumerate(p.maxDets):
                    dt_scores = np.concatenate(
                        [np.asarray(e["dtScores"])[:max_det] for e in ev])
                    order = np.argsort(-dt_scores, kind="mergesort")
                    dt_scores = dt_scores[order]
                    dtm = np.concatenate(
                        [e["dtMatches"][:, :max_det] for e in ev], axis=1)[:, order]
                    dt_ig = np.concatenate(
                        [e["dtIgnore"][:, :max_det] for e in ev], axis=1)[:, order]
                    gt_ig = np.concatenate([e["gtIgnore"] for e in ev])
                    npig = int((gt_ig == 0).sum())
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm >= 0, ~dt_ig.astype(bool))
                    fps = np.logical_and(dtm < 0, ~dt_ig.astype(bool))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for ti in range(T):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        rc = tp / npig
                        pr = tp / (tp + fp + np.spacing(1))
                        recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0
                        # precision envelope (monotone non-increasing)
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, p.recThrs, side="left")
                        q = np.zeros(R)
                        ss = np.zeros(R)
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                                ss[ri] = dt_scores[pi]
                        precision[ti, :, ki, ai, mi] = q
                        scores[ti, :, ki, ai, mi] = ss
        self.eval = {"precision": precision, "recall": recall,
                     "scores": scores, "params": p}

    # ------------------------------------------------------------------
    def _summarize(self, ap: int, iouThr: Optional[float] = None,
                   areaRng: str = "all", maxDets: int = 100) -> float:
        p = self.params
        ai = p.areaRngLbl.index(areaRng)
        mi = p.maxDets.index(maxDets)
        if ap:
            s = self.eval["precision"]
            if iouThr is not None:
                s = s[np.where(np.isclose(p.iouThrs, iouThr))[0]]
            s = s[:, :, :, ai, mi]
        else:
            s = self.eval["recall"]
            if iouThr is not None:
                s = s[np.where(np.isclose(p.iouThrs, iouThr))[0]]
            s = s[:, :, ai, mi]
        valid = s[s > -1]
        mean = float(valid.mean()) if valid.size else -1.0
        kind = "(AP)" if ap else "(AR)"
        thr = (f"{p.iouThrs[0]:.2f}:{p.iouThrs[-1]:.2f}" if iouThr is None
               else f"{iouThr:.2f}")
        print(f" Average {'Precision' if ap else 'Recall   '} {kind} "
              f"@[ IoU={thr:<9} | area={areaRng:>6} | "
              f"maxDets={maxDets:>3} ] = {mean:0.3f}")
        return mean

    def summarize(self):
        s = self._summarize
        self.stats = np.array([
            s(1), s(1, 0.5), s(1, 0.75),
            s(1, areaRng="small"), s(1, areaRng="medium"), s(1, areaRng="large"),
            s(0, maxDets=1), s(0, maxDets=10), s(0, maxDets=100),
            s(0, areaRng="small"), s(0, areaRng="medium"), s(0, areaRng="large"),
        ])
        return self.stats
