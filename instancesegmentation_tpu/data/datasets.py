"""Dataset adapters (VOC / COCO / VerSeg layouts) + the synthetic shapes
dataset used for CI and smoke training.

Mirrors the reference's adapter surface: per-dataset ``get_annotation``
returning COCO handles + label map (annotation/{voc,coco,verseg}.py) and a
Dataset that yields one decoded/augmented sample
(inst_model/yolact/utils/dataloader.py:30-78). Samples come back as a
plain dict; the loader pads/collates them into fixed-shape batches.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from instancesegmentation_tpu.data import rle
from instancesegmentation_tpu.data.coco import COCO, get_coco_label_map


@dataclass
class Annotation:
    """What get_annotation returns (annotation/voc.py:22-46 shape)."""
    train_image_path: str
    val_image_path: str
    train_coco: COCO
    val_coco: COCO
    class_names: List[str]
    num_classes: int
    label_map: Dict[int, int]


def get_annotation(exp_name: str, data_root: str, class_names: List[str]
                   ) -> Annotation:
    """Dataset-layout chooser. Layouts follow the reference:
    voc: VOC2007 train / VOC2012 val (annotation/voc.py:38-42);
    coco: train2017 / val2014 jsons (annotation/coco.py:35-44);
    verseg: Train/ Validation/ dirs (annotation/verseg.py:33-39);
    synth: generated on the fly under data_root.
    """
    layouts = {
        "voc": (("VOC2007/JPEGImages", "VOC2007/Annotations/train.json"),
                ("VOC2012/JPEGImages", "VOC2012/Annotations/val.json")),
        "coco": (("train2017", "annotations/instances_train2017.json"),
                 ("val2014", "annotations/instances_val2014.json")),
        "verseg": (("Train/image", "Train/annotations.json"),
                   ("Validation/image", "Validation/annotations.json")),
        "shape": (("train/images", "train/annotations.json"),
                  ("val/images", "val/annotations.json")),
    }
    if exp_name not in layouts:
        raise ValueError(f"unknown dataset exp_name: {exp_name!r}")
    (tr_img, tr_json), (va_img, va_json) = layouts[exp_name]
    train_coco = COCO(os.path.join(data_root, tr_json))
    val_coco = COCO(os.path.join(data_root, va_json))
    label_map = get_coco_label_map(train_coco, class_names)
    return Annotation(os.path.join(data_root, tr_img),
                      os.path.join(data_root, va_img),
                      train_coco, val_coco, class_names, len(class_names),
                      label_map)


class SegDataset:
    """COCO-format instance-seg dataset -> per-sample dicts.

    Sample dict fields (all numpy):
      image    (H, W, 3) float32 RGB 0..255 (pre-normalization)
      boxes    (N, 4) normalized xyxy, crowds LAST (dataloader.py:40-47)
      labels   (N,) int32 0-based contiguous class ids
      masks    (N, H, W) uint8
      is_crowd (N,) bool
      image_id int
    """

    def __init__(self, image_dir: str, coco: COCO, label_map: Dict[int, int],
                 transform=None, skip_empty: bool = True,
                 cache_images: bool = False):
        """``cache_images``: keep decoded uint8 RGB frames in memory after
        first read — skips disk + PNG/JPEG decode from epoch 2 on
        (measured 15 ms/image of the 64 ms single-core sample cost at
        544^2; docs/PERF_NOTES.md round 5). Opt-in: costs H*W*3 bytes per
        image (~0.9 MB at 544^2), sized for small/medium train sets."""
        self.image_dir = image_dir
        self.coco = coco
        self.label_map = label_map
        self.transform = transform
        self.ids = [i for i in coco.getImgIds()
                    if not skip_empty or coco.imgToAnns.get(i)]
        self._image_cache: Optional[Dict[int, np.ndarray]] = \
            {} if cache_images else None

    def __len__(self):
        return len(self.ids)

    def load_image(self, image_id: int) -> np.ndarray:
        import cv2
        cached = (self._image_cache.get(image_id)
                  if self._image_cache is not None else None)
        if cached is None:
            info = self.coco.loadImgs(image_id)[0]
            path = os.path.join(self.image_dir, info["file_name"])
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(path)
            cached = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if self._image_cache is not None:
                # plain dict set: worst case under races is one duplicate
                # decode; readers never see partial state (GIL)
                self._image_cache[image_id] = cached
        return cached.astype(np.float32)

    def raw_item(self, index: int):
        """Decode one image + its annotations (no augmentation)."""
        image_id = self.ids[index]
        image = self.load_image(image_id)
        h, w = image.shape[:2]

        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=image_id))
        # non-crowd first, crowd appended last — the INTENDED reference
        # behavior (dataloader.py:40-47; note its own crowd scan is dead
        # code because it runs on the already-filtered list)
        normal = [a for a in anns if not a.get("iscrowd", 0)]
        crowd = [a for a in anns if a.get("iscrowd", 0)]
        anns = normal + crowd

        boxes, labels, masks, iscrowd = [], [], [], []
        for a in anns:
            if a["category_id"] not in self.label_map:
                continue
            x, y, bw, bh = a["bbox"]
            boxes.append([x / w, y / h, (x + bw) / w, (y + bh) / h])
            labels.append(self.label_map[a["category_id"]] - 1)
            masks.append(rle.ann_to_mask(a, h, w))
            iscrowd.append(bool(a.get("iscrowd", 0)))

        n = len(boxes)
        return {
            "image": image,
            "boxes": np.asarray(boxes, np.float32).reshape(n, 4),
            "labels": np.asarray(labels, np.int32).reshape(n),
            "masks": (np.stack(masks) if n else
                      np.zeros((0, h, w), np.uint8)).astype(np.uint8),
            "is_crowd": np.asarray(iscrowd, bool).reshape(n),
            "image_id": image_id,
        }

    def get_item(self, index: int, rng: np.random.Generator, out_hw=None):
        """``out_hw``: optional (H, W) target for this sample, used by the
        resolution-bucket sampler to override the transform's default."""
        s = self.raw_item(index)
        if self.transform is not None:
            img, masks, boxes, labels, is_crowd = self.transform(
                s["image"], s["masks"], s["boxes"], s["labels"],
                s["is_crowd"], rng, out_hw=out_hw)
            s.update(image=img, masks=masks.astype(np.uint8), boxes=boxes,
                     labels=labels, is_crowd=is_crowd)
        return s


# ---------------------------------------------------------------------------
# Synthetic shapes dataset (SURVEY §4 test plan: tiny generated COCO set)
# ---------------------------------------------------------------------------

SHAPE_CLASSES = ["square", "triangle", "circle"]


def make_synthetic_coco(root: str, split: str, num_images: int = 16,
                        image_size: int = 160, seed: int = 704,
                        max_objects: int = 4,
                        vary_aspect: bool = False) -> Tuple[str, str]:
    """Generate a tiny COCO-format dataset of colored shapes on gray noise.

    Returns (image_dir, json_path). Deterministic given the seed.
    ``vary_aspect`` draws each image's W/H from {3:4, 1:1, 4:3} so
    aspect-ratio grouping / resolution-bucket assignment is non-trivial.
    """
    import cv2
    import json as _json

    rng = np.random.RandomState(seed + (0 if split == "train" else 1))
    img_dir = os.path.join(root, split, "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        h = w = image_size
        if vary_aspect:
            ratio = [0.75, 1.0, 4.0 / 3.0][rng.randint(3)]      # w/h
            w = int(round(image_size * ratio))
        img = rng.randint(90, 120, (h, w, 3)).astype(np.uint8)
        n_obj = rng.randint(1, max_objects + 1)
        # draw onto an instance-id canvas first so ground truth stores the
        # VISIBLE (modal) mask of each shape: later shapes occlude earlier
        # ones in the image, and amodal gt would put an unreachable ceiling
        # on overfit mAP (~0.84 bbox / 0.71 mask measured)
        canvas = np.full((h, w), -1, np.int32)
        classes = []
        for j in range(n_obj):
            cls = rng.randint(len(SHAPE_CLASSES))
            size = rng.randint(image_size // 8, image_size // 3)
            cx = rng.randint(size, w - size)
            cy = rng.randint(size, h - size)
            color = tuple(int(c) for c in rng.randint(140, 255, 3))
            mask = np.zeros((h, w), np.uint8)
            if cls == 0:
                cv2.rectangle(mask, (cx - size // 2, cy - size // 2),
                              (cx + size // 2, cy + size // 2), 1, -1)
            elif cls == 1:
                pts = np.array([[cx, cy - size // 2],
                                [cx - size // 2, cy + size // 2],
                                [cx + size // 2, cy + size // 2]], np.int32)
                cv2.fillPoly(mask, [pts], 1)
            else:
                cv2.circle(mask, (cx, cy), size // 2, 1, -1)
            img[mask > 0] = color
            canvas[mask > 0] = j
            classes.append(cls)
        for j, cls in enumerate(classes):
            mask = (canvas == j).astype(np.uint8)
            if not mask.any():     # fully occluded by later shapes
                continue
            ys, xs = np.nonzero(mask)
            x1, y1, x2, y2 = xs.min(), ys.min(), xs.max() + 1, ys.max() + 1
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cls + 1,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "area": float(mask.sum()), "iscrowd": 0,
                "segmentation": rle.encode(mask),
            })
            ann_id += 1
        fname = f"{split}_{i:04d}.png"
        cv2.imwrite(os.path.join(img_dir, fname), img[:, :, ::-1])
        images.append({"id": i + 1, "file_name": fname,
                       "height": h, "width": w})

    categories = [{"id": c + 1, "name": n}
                  for c, n in enumerate(SHAPE_CLASSES)]
    json_path = os.path.join(root, split, "annotations.json")
    with open(json_path, "w") as f:
        _json.dump({"images": images, "annotations": annotations,
                    "categories": categories}, f)
    return img_dir, json_path


def synthetic_annotation(root: str, num_images: int = 16,
                         image_size: int = 160,
                         vary_aspect: bool = False) -> Annotation:
    """Build (generating if needed) the synthetic dataset's Annotation.
    ``vary_aspect`` datasets should live under their own root (generation
    is skipped when annotations already exist)."""
    for split in ("train", "val"):
        if not os.path.exists(os.path.join(root, split, "annotations.json")):
            make_synthetic_coco(root, split, num_images, image_size,
                                vary_aspect=vary_aspect)
    return get_annotation("shape", root, list(SHAPE_CLASSES))
