"""RoIAlign (bilinear, average-pooled sampling grid) + FPN level assignment.

Replaces torchvision's C++/CUDA ``roi_align`` / ``MultiScaleRoIAlign``
(reference: .../Mask_RCNN/net/network_files/roi_head.py:6,106;
faster_rcnn_framework.py:325-329; mask_rcnn.py:149-150 — SURVEY §2.9 calls
this "the single most important custom kernel").

This module provides the pure-jnp gather formulation (differentiable,
works everywhere, the golden reference for the Pallas kernel in
ops/pallas/roi_align.py). Semantics follow torchvision roi_align with
``aligned=False`` (the torchvision 0.4 behavior the reference pins):

  bin grid over [x1*scale, x2*scale] x [y1*scale, y2*scale], sampling_ratio
  points per bin side (default 2, or ceil(roi_size/out_size) when -1),
  bilinear interpolation with zero padding outside, average over samples.

All shapes static: rois are a fixed-size (R, 4) tensor with a validity
mask; invalid rois produce zeros.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample feat (H, W, C) at float coords ys/xs (...,) -> (..., C).

    torchvision convention: points with y < -1 or > H are zero; points in
    [-1, 0] clamp to 0 (likewise x).
    """
    h, w = feat.shape[0], feat.shape[1]
    valid = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)

    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]

    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    return out * valid[..., None].astype(out.dtype)


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, out_size: Tuple[int, int],
              spatial_scale: float, sampling_ratio: int = 2) -> jnp.ndarray:
    """feat (H, W, C); rois (R, 4) xyxy in IMAGE coords -> (R, oh, ow, C)."""
    oh, ow = out_size
    s = sampling_ratio
    roi = rois * spatial_scale
    x1, y1, x2, y2 = roi[:, 0], roi[:, 1], roi[:, 2], roi[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)            # torchvision min size 1
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / ow                            # (R,)
    bin_h = roi_h / oh

    # sample offsets within a bin: (i + .5)/s for i in [0, s)
    off = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s            # (s,)
    gy = (y1[:, None, None] + (jnp.arange(oh, dtype=feat.dtype)[None, :, None]
                               + off[None, None, :]) * bin_h[:, None, None])
    gx = (x1[:, None, None] + (jnp.arange(ow, dtype=feat.dtype)[None, :, None]
                               + off[None, None, :]) * bin_w[:, None, None])
    # full grid: (R, oh, s, ow, s)
    ys = gy[:, :, :, None, None]                  # (R, oh, s, 1, 1)
    xs = gx[:, None, None, :, :]                  # (R, 1, 1, ow, s)
    ys, xs = jnp.broadcast_arrays(ys, xs)

    samples = _bilinear_gather(feat, ys, xs)      # (R, oh, s, ow, s, C)
    return samples.mean(axis=(2, 4))              # (R, oh, ow, C)


def fpn_level_assignment(rois: jnp.ndarray, k_min: int = 2, k_max: int = 5,
                         canonical_scale: float = 224.0,
                         canonical_level: int = 4) -> jnp.ndarray:
    """Heuristic FPN level per roi (torchvision LevelMapper semantics used
    by MultiScaleRoIAlign): k = floor(k0 + log2(sqrt(area)/224 + eps)),
    clamped. Returns 0-based level index into the feature list."""
    area = jnp.maximum((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]),
                       0.0)
    scale = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + 1e-6))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multiscale_roi_align(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                         out_size: Tuple[int, int],
                         spatial_scales: Sequence[float],
                         sampling_ratio: int = 2) -> jnp.ndarray:
    """MultiScaleRoIAlign over FPN levels (static shapes).

    feats: list of (Hl, Wl, C) maps (e.g. P2..P5); rois (R, 4) image coords.
    Computes roi_align against every level and selects per-roi by the
    canonical assignment — 4x the FLOPs of a gather-per-level approach but
    branch-free and fully fused by XLA; the Pallas kernel replaces this on
    the hot path.
    """
    levels = fpn_level_assignment(rois)           # (R,)
    outs = [roi_align(f, rois, out_size, sc, sampling_ratio)
            for f, sc in zip(feats, spatial_scales)]
    stacked = jnp.stack(outs)                     # (L, R, oh, ow, C)
    sel = jax.nn.one_hot(levels, len(feats), dtype=stacked.dtype)  # (R, L)
    return jnp.einsum("lrhwc,rl->rhwc", stacked, sel)
