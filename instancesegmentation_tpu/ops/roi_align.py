"""RoIAlign (bilinear, average-pooled sampling grid) + FPN level assignment.

Replaces torchvision's C++/CUDA ``roi_align`` / ``MultiScaleRoIAlign``
(reference: .../Mask_RCNN/net/network_files/roi_head.py:6,106;
faster_rcnn_framework.py:325-329; mask_rcnn.py:149-150 — SURVEY §2.9 calls
this "the single most important custom kernel").

This module provides the pure-jnp gather formulation (differentiable,
works everywhere, the golden reference for the Pallas kernel in
ops/pallas/roi_align.py). Default semantics follow torchvision roi_align
with ``aligned=False`` (the torchvision 0.4 behavior the reference pins);
``aligned=True`` opts into the half-pixel-corrected grid (coords shifted
by -0.5, no min-1 roi clamp) of later torchvision / Detectron2 — measured
to remove the reference's systematic sub-pixel box bias (BASELINE.md):

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
              spatial_scale: float, sampling_ratio: int = 2,
              aligned: bool = False) -> jnp.ndarray:
    """feat (H, W, C); rois (R, 4) xyxy in IMAGE coords -> (R, oh, ow, C)."""
    oh, ow = out_size
    s = sampling_ratio
    roi = rois * spatial_scale - (0.5 if aligned else 0.0)
    x1, y1, x2, y2 = roi[:, 0], roi[:, 1], roi[:, 2], roi[:, 3]
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:                               # torchvision min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
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


def _interp_pool_matrix(starts: jnp.ndarray, bins: jnp.ndarray, size: int,
                        out_bins: int, sampling_ratio: int, dtype
                        ) -> jnp.ndarray:
    """Per-roi 1-D interpolation+pooling operator B (out_bins, size).

    B[i, h] = mean over the roi's samples in bin i of the bilinear weight
    each sample places on source index h. RoIAlign is then the
    bilinear-sampled, bin-averaged map  out = B_y @ feat @ B_x^T  —
    bilinear sampling and average pooling are both linear, so the whole op
    folds into two dense matmuls that run on the MXU instead of gathers.

    ``sampling_ratio``: samples per bin side; -1 selects torchvision's
    ADAPTIVE count ``ceil(roi_size / out_bins)`` per roi. Adaptive counts
    are data-dependent, so the STATIC sample axis is sized to the exact
    upper bound ``ceil(size / out_bins)`` (a roi cannot exceed the source)
    and each roi's unused sample slots get weight zero — same numbers as
    torchvision's per-roi loop, static shapes for XLA.

    starts: (R,) roi start coordinate (scaled); bins: (R,) bin size.
    Returns (R, out_bins, size).
    """
    if sampling_ratio == -1:
        # adaptive: n_r = ceil(bins_r) samples, statically bounded
        s = max(1, -(-size // out_bins))
        n = jnp.clip(jnp.ceil(bins), 1, s)                          # (R,) f32
        i = jnp.arange(s, dtype=dtype)
        off = (i[None, :] + 0.5) / n[:, None]                       # (R, s)
        w_samp = jnp.where(i[None, :] < n[:, None],
                           1.0 / n[:, None], 0.0)                   # (R, s)
        coords = (starts[:, None, None]
                  + (jnp.arange(out_bins, dtype=dtype)[None, :, None]
                     + off[:, None, :]) * bins[:, None, None])
    else:
        s = sampling_ratio
        off = (jnp.arange(s, dtype=dtype) + 0.5) / s                # (s,)
        w_samp = None                                               # uniform
        # sample coords: (R, out_bins, s)
        coords = (starts[:, None, None]
                  + (jnp.arange(out_bins, dtype=dtype)[None, :, None]
                     + off[None, None, :]) * bins[:, None, None])
    valid = (coords >= -1.0) & (coords <= size)
    c = jnp.clip(coords, 0.0, size - 1)
    c0 = jnp.floor(c)
    frac = c - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, size - 1)

    iota = jnp.arange(size, dtype=jnp.int32)                        # (size,)
    w0 = ((iota == c0i[..., None]) * (1.0 - frac[..., None])
          + (iota == c1i[..., None]) * frac[..., None])             # (R,ob,s,size)
    w0 = w0 * valid[..., None]
    if w_samp is None:
        return jnp.mean(w0, axis=2).astype(dtype)                   # (R,ob,size)
    return jnp.einsum("rbsh,rs->rbh", w0, w_samp).astype(dtype)


def roi_align_separable(feat: jnp.ndarray, rois: jnp.ndarray,
                        out_size: Tuple[int, int], spatial_scale: float,
                        sampling_ratio: int = 2,
                        aligned: bool = False) -> jnp.ndarray:
    """MXU formulation of roi_align (exactly equal to ``roi_align``).

    feat (H, W, C); rois (R, 4) image-coord xyxy -> (R, oh, ow, C).
    Cost per roi ~= oh*H*W*C + oh*ow*W*C MACs — tiny on the MXU and with
    no gathers, so it vectorizes over rois and levels with no dynamic
    memory access (SURVEY §2.9's "most important custom kernel", done as
    matmuls rather than a Pallas gather loop).
    """
    oh, ow = out_size
    dtype = feat.dtype
    # compute follows the input dtype: for bf16 FPN features (the model's
    # mixed-precision path) the (R, oh, W, C) intermediate is the dominant
    # HBM traffic — upcasting it to f32 doubles that for no accuracy the
    # bf16 features still carry. f32 inputs keep exact f32 compute (the
    # golden-test and mask-target-projection path).
    compute = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    roi = rois.astype(jnp.float32) * spatial_scale - (0.5 if aligned else 0.0)
    x1, y1 = roi[:, 0], roi[:, 1]
    roi_w, roi_h = roi[:, 2] - roi[:, 0], roi[:, 3] - roi[:, 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    by = _interp_pool_matrix(y1, roi_h / oh, feat.shape[0], oh,
                             sampling_ratio, jnp.float32)           # (R,oh,H)
    bx = _interp_pool_matrix(x1, roi_w / ow, feat.shape[1], ow,
                             sampling_ratio, jnp.float32)           # (R,ow,W)

    tmp = jnp.einsum("ryh,hwc->rywc", by.astype(compute),
                     feat.astype(compute),
                     preferred_element_type=compute)
    out = jnp.einsum("rywc,rxw->ryxc", tmp, bx.astype(compute),
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def multiscale_roi_align_separable(feats: Sequence[jnp.ndarray],
                                   rois: jnp.ndarray,
                                   out_size: Tuple[int, int],
                                   spatial_scales: Sequence[float],
                                   sampling_ratio: int = 2,
                                   aligned: bool = False) -> jnp.ndarray:
    """MultiScaleRoIAlign via the separable-matmul kernel.

    Computes every level and selects per-roi by the canonical assignment;
    with the matmul formulation the extra levels cost ~1.3x of the finest
    level alone (cost scales with level H), so the branch-free form wins.
    """
    levels = fpn_level_assignment(rois)
    sel = jax.nn.one_hot(levels, len(feats), dtype=jnp.float32)     # (R, L)
    out = None
    for li, (f, sc) in enumerate(zip(feats, spatial_scales)):
        o = roi_align_separable(f, rois, out_size, sc, sampling_ratio,
                                aligned=aligned)
        o = o * sel[:, li][:, None, None, None].astype(o.dtype)
        out = o if out is None else out + o
    return out


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
