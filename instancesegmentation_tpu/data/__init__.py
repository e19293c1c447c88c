"""Host-side data layer: COCO-format parsing, RLE masks, augmentation,
padded-batch loading. Everything here runs on CPU (numpy/cv2) and feeds
fixed-shape batches to the device path.

Replaces the reference's pycocotools + per-model Dataset classes
(/root/reference/annotation/*, inst_model/*/utils/dataloader.py) — but
self-contained: this environment has no pycocotools, so the COCO JSON
API, the RLE codec, and COCO mAP evaluation are implemented in-repo
(numpy + optional C++ acceleration in native/).
"""
