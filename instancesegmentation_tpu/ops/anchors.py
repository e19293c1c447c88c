"""Anchor generators for both model families.

* YOLACT: analytic conv-ladder feature sizes + per-level (cx, cy, w, h)
  normalized anchors, 3 aspect ratios {1, 1/2, 2}
  (reference: /root/reference/inst_model/yolact/utils/anchors.py:7-48).
* Mask R-CNN: per-FPN-level pixel-space grid anchors, sizes
  ((32,),(64,),(128,),(256,),(512,)) x ratios (0.5, 1, 2)
  (reference: .../Mask_RCNN/net/network_files/rpn_function.py:25-208,
  defaults faster_rcnn_framework.py:297-302).

Generated once on host in numpy (anchors are constants w.r.t. jit), then
fed to jitted code as arrays.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

YOLACT_ASPECT_RATIOS = (1.0, 0.5, 2.0)


def yolact_feature_sizes(height: int, width: int) -> Tuple[np.ndarray, np.ndarray]:
    """Feature map sizes of the 5 prediction levels for a given input.

    Simulates the 7-conv ladder (k=7 then 3s, stride 2, 'same'-ish padding)
    the reference uses (anchors.py:25-37) and keeps the last 5 entries.
    For 544x544 this yields [68, 34, 17, 9, 5].
    """
    filter_sizes = [7, 3, 3, 3, 3, 3, 3]
    paddings = [3, 1, 1, 1, 1, 1, 1]
    strides = [2] * 7
    hs, ws = [], []
    for k, p, s in zip(filter_sizes, paddings, strides):
        height = (height + 2 * p - k) // s + 1
        width = (width + 2 * p - k) // s + 1
        hs.append(height)
        ws.append(width)
    return np.array(hs[-5:]), np.array(ws[-5:])


def _level_anchors(conv_h: int, conv_w: int, scale: float,
                   input_shape: Sequence[int],
                   aspect_ratios: Sequence[float]) -> np.ndarray:
    """Normalized (cx, cy, w, h) anchors for one level, reference ordering:
    row-major over (y, x) cells, aspect ratios innermost (anchors.py:7-20).
    """
    ys, xs = np.meshgrid(np.arange(conv_h), np.arange(conv_w), indexing="ij")
    cx = (xs.reshape(-1) + 0.5) / conv_w           # (cells,)
    cy = (ys.reshape(-1) + 0.5) / conv_h
    sq = np.sqrt(np.asarray(aspect_ratios, dtype=np.float64))
    w = scale * sq / input_shape[1]                 # (ars,)
    h = scale / sq / input_shape[0]
    n_cells, n_ar = cx.shape[0], len(aspect_ratios)
    out = np.empty((n_cells, n_ar, 4), dtype=np.float32)
    out[..., 0] = cx[:, None]
    out[..., 1] = cy[:, None]
    out[..., 2] = w[None, :]
    out[..., 3] = h[None, :]
    return out.reshape(-1, 4)


def yolact_anchors(input_shape: Sequence[int] = (544, 544),
                   anchors_size: Sequence[float] = (24, 48, 96, 192, 384),
                   aspect_ratios: Sequence[float] = YOLACT_ASPECT_RATIOS
                   ) -> np.ndarray:
    """All-level YOLACT anchors, (N, 4) normalized cxcywh.

    N = 18525 for 544x544 input (matches nets/yolact.py:183-186 comment).
    Anchors are deliberately NOT clipped (reference behavior).
    """
    fh, fw = yolact_feature_sizes(input_shape[0], input_shape[1])
    per_level = [
        _level_anchors(int(h), int(w), float(s), input_shape, aspect_ratios)
        for h, w, s in zip(fh, fw, anchors_size)
    ]
    return np.concatenate(per_level, axis=0)


# ---------------------------------------------------------------------------
# Mask R-CNN / RPN grid anchors
# ---------------------------------------------------------------------------

RCNN_ANCHOR_SIZES = ((32,), (64,), (128,), (256,), (512,))
RCNN_ASPECT_RATIOS = ((0.5, 1.0, 2.0),) * 5


def _cell_anchors(sizes: Sequence[float], ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered base anchors (rpn_function.py:77-99): for each ratio r,
    (w, h) = (size/sqrt(r), size*sqrt(r)), rounded like the reference.
    """
    sizes = np.asarray(sizes, dtype=np.float64)
    ratios = np.asarray(ratios, dtype=np.float64)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * sizes[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * sizes[None, :]).reshape(-1)
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2
    return np.round(base).astype(np.float32)


def rcnn_grid_anchors(feature_sizes_hw: Sequence[Tuple[int, int]],
                      image_size_hw: Tuple[int, int],
                      sizes=RCNN_ANCHOR_SIZES,
                      aspect_ratios=RCNN_ASPECT_RATIOS) -> np.ndarray:
    """Pixel-space xyxy anchors over all FPN levels, concatenated.

    Strides are image_size // feature_size per level (rpn_function.py:160-169);
    anchor order within a level is row-major cells x (ratio-major base
    anchors), matching the head's reshape order.
    """
    all_levels = []
    for (fh, fw), lvl_sizes, lvl_ratios in zip(feature_sizes_hw, sizes, aspect_ratios):
        stride_h = image_size_hw[0] // fh
        stride_w = image_size_hw[1] // fw
        base = _cell_anchors(lvl_sizes, lvl_ratios)       # (A, 4)
        shifts_x = np.arange(fw, dtype=np.float32) * stride_w
        shifts_y = np.arange(fh, dtype=np.float32) * stride_h
        sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
        shifts = np.stack([sx.reshape(-1), sy.reshape(-1),
                           sx.reshape(-1), sy.reshape(-1)], axis=1)  # (cells, 4)
        anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        all_levels.append(anchors.astype(np.float32))
    return np.concatenate(all_levels, axis=0)


def rcnn_level_sizes(feature_sizes_hw: Sequence[Tuple[int, int]],
                     num_base_anchors: int = 3) -> Tuple[int, ...]:
    """Anchors-per-level counts (for per-level top-k in the RPN)."""
    return tuple(int(h * w * num_base_anchors) for h, w in feature_sizes_hw)


def fpn_feature_sizes(image_size_hw: Tuple[int, int], num_levels: int = 5,
                      first_stride: int = 4) -> Tuple[Tuple[int, int], ...]:
    """Feature sizes of a standard FPN (P2..P6-style strides 4,8,16,32,64
    for the torchvision layout the reference uses: levels '0'-'3' + pool)."""
    out = []
    stride = first_stride
    for _ in range(num_levels):
        out.append((int(math.ceil(image_size_hw[0] / stride)),
                    int(math.ceil(image_size_hw[1] / stride))))
        stride *= 2
    return tuple(out)
