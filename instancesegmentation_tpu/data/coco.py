"""Minimal COCO-format JSON API (pycocotools.COCO replacement, pure python).

The environment has no pycocotools, so this module provides the exact
surface the reference code consumes (annotation/voc.py:22-46,
inst_model/yolact/utils/dataloader.py:33-57, eval.py:58-96):
index by image/category, ann loading, annToMask, plus the label-map
helper (annotation/voc.py:9-20).
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from instancesegmentation_tpu.data import rle


class COCO:
    """COCO-format dataset index. Accepts a path or an already-parsed dict."""

    def __init__(self, annotation: Union[str, Dict, None] = None):
        self.dataset: Dict = {}
        self.anns: Dict[int, Dict] = {}
        self.imgs: Dict[int, Dict] = {}
        self.cats: Dict[int, Dict] = {}
        self.imgToAnns: Dict[int, List[Dict]] = defaultdict(list)
        self.catToImgs: Dict[int, List[int]] = defaultdict(list)
        if annotation is not None:
            if isinstance(annotation, str):
                with open(annotation, "r") as f:
                    self.dataset = json.load(f)
            else:
                self.dataset = annotation
            self.create_index()

    def create_index(self):
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.imgToAnns[ann["image_id"]].append(ann)
            self.catToImgs[ann["category_id"]].append(ann["image_id"])

    # -- query ------------------------------------------------------------
    def getImgIds(self, imgIds=None, catIds=None) -> List[int]:
        if catIds:
            ids = set()
            for c in catIds:
                ids.update(self.catToImgs.get(c, []))
            out = sorted(ids)
        else:
            out = sorted(self.imgs.keys())
        if imgIds:
            want = set(imgIds)
            out = [i for i in out if i in want]
        return out

    def getAnnIds(self, imgIds=None, catIds=None, iscrowd: Optional[bool] = None
                  ) -> List[int]:
        if imgIds is not None:
            if isinstance(imgIds, int):
                imgIds = [imgIds]
            anns: List[Dict] = []
            for i in imgIds:
                anns.extend(self.imgToAnns.get(i, []))
        else:
            anns = list(self.anns.values())
        if catIds is not None:
            want = set(catIds if not isinstance(catIds, int) else [catIds])
            anns = [a for a in anns if a["category_id"] in want]
        if iscrowd is not None:
            anns = [a for a in anns if bool(a.get("iscrowd", 0)) == iscrowd]
        return [a["id"] for a in anns]

    def loadAnns(self, ids: Sequence[int]) -> List[Dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.anns[i] for i in ids]

    def loadImgs(self, ids) -> List[Dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def getCatIds(self) -> List[int]:
        return sorted(self.cats.keys())

    def loadCats(self, ids) -> List[Dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.cats[i] for i in ids]

    # -- masks ------------------------------------------------------------
    def annToMask(self, ann: Dict) -> np.ndarray:
        img = self.imgs[ann["image_id"]]
        return rle.ann_to_mask(ann, img["height"], img["width"])

    # -- results ----------------------------------------------------------
    def loadRes(self, results: Union[str, List[Dict]]) -> "COCO":
        """Build a results COCO from a detection list/json (pycocotools
        COCO.loadRes surface, used by eval.py:82-96)."""
        if isinstance(results, str):
            with open(results) as f:
                results = json.load(f)
        res = COCO()
        res.dataset = {
            "images": list(self.dataset.get("images", [])),
            "categories": list(self.dataset.get("categories", [])),
            "annotations": [],
        }
        for i, det in enumerate(results):
            ann = dict(det)
            ann["id"] = i + 1
            ann.setdefault("iscrowd", 0)
            # pycocotools ALWAYS recomputes area (any area in the results
            # json is ignored), with bbox taking precedence over the mask
            if "bbox" in ann and list(ann["bbox"]):
                ann["area"] = float(ann["bbox"][2] * ann["bbox"][3])
            elif "segmentation" in ann:
                seg = ann["segmentation"]
                if not (isinstance(seg, dict)
                        and not isinstance(seg.get("counts"), list)):
                    # polygon / uncompressed results: rasterize first
                    img = self.imgs[ann["image_id"]]
                    seg = rle.encode(rle.ann_to_mask(
                        ann, img["height"], img["width"]))
                    ann["segmentation"] = seg
                ann["area"] = float(rle.area(seg))
                if "bbox" not in ann:
                    m = rle.decode(seg)
                    ys, xs = np.nonzero(m)
                    if len(xs):
                        ann["bbox"] = [float(xs.min()), float(ys.min()),
                                       float(xs.max() - xs.min() + 1),
                                       float(ys.max() - ys.min() + 1)]
                    else:
                        ann["bbox"] = [0.0, 0.0, 0.0, 0.0]
            res.dataset["annotations"].append(ann)
        res.create_index()
        return res


def get_coco_label_map(coco: COCO, class_names: Sequence[str]) -> Dict[int, int]:
    """category_id -> contiguous 1-based index following class_names order,
    skipping '_background_' (annotation/voc.py:9-20)."""
    name_to_catid = {}
    for cat_id, cat in coco.cats.items():
        if cat["name"] == "_background_":
            continue
        name_to_catid[cat["name"]] = cat_id
    label_map = {}
    for idx, name in enumerate(class_names):
        if name in name_to_catid:
            label_map[name_to_catid[name]] = idx + 1
    return label_map


def get_classes(classes_path: str):
    """Newline class list -> (names, count) (inst_model/yolact/utils/utils.py:27-31)."""
    with open(classes_path, encoding="utf-8") as f:
        names = [c.strip() for c in f.readlines() if c.strip()]
    return names, len(names)
