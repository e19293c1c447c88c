"""On-device image normalization — the H2D boundary ships uint8.

The reference ships normalized f32 CHW tensors across its H2D boundary
(/root/reference/models/script.py:163-166): 3.5 MB/img at 544². Here the
loader/predictors ship raw uint8 RGB (0.9 MB/img, a 4x byte cut) and the
``(x - mean) / std`` affine runs inside the jitted step, where XLA fuses it
into the first convolution's input pipeline.

Constant provenance:
* YOLACT: caffe-style mean/std on 0-255 RGB
  (inst_model/yolact/utils/utils.py:33-37 preprocess_input).
* Mask R-CNN: the reference applies preprocess_input at the dataset level
  (inst_model/Mask_RCNN/utils/dataloader.py:214) and THEN
  GeneralizedRCNNTransform's ImageNet normalize
  (faster_rcnn_framework.py:356-361) — a double-normalization quirk kept
  for parity. Both are affine, so they fold into a single fused
  mean/std pair: ((x-m1)/s1 - m2)/s2 == (x - (m1 + m2*s1)) / (s1*s2).

Functions accept float inputs unchanged (trace-time dtype dispatch), so
callers that already normalized on host — tests, the export path's f32
input spec, the box-head oracle — keep working bit-identically.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# RGB order (inst_model/yolact/utils/utils.py:33-37)
YOLACT_MEAN = np.array((123.68, 116.78, 103.94), np.float32)
YOLACT_STD = np.array((58.40, 57.12, 57.38), np.float32)

IMAGENET_MEAN = np.array((0.485, 0.456, 0.406), np.float32)
IMAGENET_STD = np.array((0.229, 0.224, 0.225), np.float32)

# fused double-normalize (see module docstring)
RCNN_MEAN = YOLACT_MEAN + IMAGENET_MEAN * YOLACT_STD
RCNN_STD = YOLACT_STD * IMAGENET_STD


def pack_mask_bits(masks: np.ndarray) -> np.ndarray:
    """(..., W) {0,1} uint8 -> (..., ceil(W/8)) bit-packed uint8 (big-endian
    bit order, np.packbits default). Mask R-CNN gt masks ship at IMAGE
    resolution (the 28^2 target projection pools them on device,
    roi_heads.py maskrcnn_loss), which makes them the dominant H2D term —
    at 800^2 with max_instances=48 they are 32 MB/img as bytes, 4 MB
    packed. Exact: masks are binary."""
    return np.packbits(masks.astype(bool), axis=-1)


def unpack_mask_bits(masks, width: int):
    """Device-side inverse of pack_mask_bits -> (..., width) uint8 {0,1}.
    Passthrough when masks already carry ``width`` columns (tests and the
    YOLACT proto-res path ship unpacked)."""
    if masks.shape[-1] == width:
        return masks
    assert masks.shape[-1] == -(-width // 8), (masks.shape, width)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)          # big-endian
    bits = (masks[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(masks.shape[:-1] + (masks.shape[-1] * 8,))[..., :width]


def normalize_on_device(images, net: str = "yolact"):
    """uint8 (B, H, W, 3) -> normalized float32; float inputs pass through
    (already normalized on host)."""
    if images.dtype != jnp.uint8:
        return images
    if net == "yolact":
        mean, std = YOLACT_MEAN, YOLACT_STD
    elif net == "mask_rcnn":
        mean, std = RCNN_MEAN, RCNN_STD
    else:
        raise ValueError(f"unknown net {net!r}")
    return (images.astype(jnp.float32) - mean) / std
