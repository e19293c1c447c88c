"""Pallas TPU RoIAlign kernel.

The Pallas backend for ops/roi_align.py (torchvision's C++/CUDA roi_align,
SURVEY §2.9's "single most important custom kernel"). Uses the same
separable-linear-operator math as ``roi_align_separable``:

    out_r = B_y(r) @ feat @ B_x(r)^T        (pooling folded into B)

but as a hand-scheduled kernel: the feature map is pinned in VMEM for the
whole grid in bf16 (one HBM read total; f32 would exceed the ~16 MB VMEM
at P2 scale: 136*136*256*4B = 18.9 MB), each grid step processes a block
of rois, the per-roi interpolation operators are built in-register from
2-D broadcasted iota (Mosaic requires integer iota and dislikes >2-D
iota), and both contractions hit the MXU with f32 accumulation.

Numerics match torchvision roi_align with aligned=False (bf16 feature
rounding aside); verified against ops/roi_align.py's golden in interpret
mode and on device.

Training uses ``roi_align_tpu`` — the kernel forward plus an analytic
custom VJP (the separable form makes the feature gradient two transposed
matmuls: dF = sum_r By_r^T @ (g_r @ Bx_r)); rois receive zero gradient,
matching torchvision's roi_align backward (and the reference detaches
proposals before the heads anyway, rpn_function.py:623).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rois_ref, feat_ref, out_ref, *, oh: int, ow: int, h: int, w: int,
            cb: int, spatial_scale: float, sampling_ratio: int,
            roi_block: int, aligned: bool):
    """Grid: (c_blocks, num_roi_blocks) — channels are embarrassingly
    parallel in the separable form, so blocking C bounds the resident
    (double-buffered!) feature block at P2 scale. rois_ref (R_padded, 4)
    SMEM — the WHOLE roi table stays resident (R*16 B, well under the 1 MB
    SMEM) because a per-step (roi_block, 4) block would need
    roi_block % 8 == 0; feat_ref (1, H, W*Cb) bf16 VMEM (the caller
    pre-transposes to channel-slab-major so the kernel reads a plain 2-D
    matmul operand — an in-kernel (H,W,Cb)->(H,W*Cb) reshape forces a
    per-step relayout, measured 10x slower); out (roi_block, oh*ow, Cb)
    f32."""
    s = sampling_ratio
    pid = pl.program_id(1)

    def stacked_interp_matrix(starts, bin_sizes, size, out_bins):
        """(roi_block*out_bins, size) pooling+interp operator for ALL rois
        of the block STACKED along rows, built from 2-D integer iota only.
        Stacking turns roi_block tiny (out_bins, size) matmuls into one
        (roi_block*out_bins, size) matmul — M goes from ~7 to ~rb*7 rows,
        which is the difference between ~6%% and ~40%% MXU row
        utilization on the dominant contraction."""
        n = roi_block * out_bins * s
        flat = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        within = flat % (out_bins * s)
        roi_of = flat // (out_bins * s)
        bins = (within // s).astype(jnp.float32)
        off = ((within % s).astype(jnp.float32) + 0.5) / s
        start = jnp.zeros((n, 1), jnp.float32)
        bsz = jnp.zeros((n, 1), jnp.float32)
        for r in range(roi_block):                           # scalar selects
            m = (roi_of == r).astype(jnp.float32)
            start = start + m * starts[r]
            bsz = bsz + m * bin_sizes[r]
        coords = start + (bins + off) * bsz                  # (n, 1)
        valid = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1)
        c0 = jnp.floor(cc)
        frac = cc - c0
        c0i = c0.astype(jnp.int32)
        c1i = jnp.minimum(c0i + 1, size - 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1)
        m = ((iota == c0i) * (1.0 - frac)
             + (iota == c1i) * frac) * valid                 # (n, size)
        # fold the bin average: sum the s sample rows per bin / s
        return jnp.mean(m.reshape(roi_block * out_bins, s, size), axis=1)

    shift = 0.5 if aligned else 0.0
    y1s, bhs, x1s, bws = [], [], [], []
    for r in range(roi_block):
        idx = pid * roi_block + r
        x1 = rois_ref[idx, 0] * spatial_scale - shift
        y1 = rois_ref[idx, 1] * spatial_scale - shift
        x2 = rois_ref[idx, 2] * spatial_scale - shift
        y2 = rois_ref[idx, 3] * spatial_scale - shift
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        y1s.append(y1); bhs.append(roi_h / oh)
        x1s.append(x1); bws.append(roi_w / ow)

    by = stacked_interp_matrix(y1s, bhs, h, oh)              # (rb*oh, H)
    bx = stacked_interp_matrix(x1s, bws, w, ow)              # (rb*ow, W)

    # one stacked matmul for the dominant contraction (a bf16 round-trip
    # on tmp was tried to buy more rows and measured SLOWER — the cast
    # breaks Mosaic's dot pipelining)
    tmp = jnp.dot(by.astype(jnp.bfloat16), feat_ref[0],
                  preferred_element_type=jnp.float32)        # (rb*oh, W*Cb)
    for r in range(roi_block):                               # unrolled
        tmp_r = tmp[r * oh:(r + 1) * oh].reshape(oh, w, cb)
        out = jax.lax.dot_general(
            bx[r * ow:(r + 1) * ow], tmp_r,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (ow, oh, Cb)
        out_ref[r, :, :] = jnp.transpose(out, (1, 0, 2)).reshape(oh * ow, cb)


def _pick_blocks(h: int, w: int, c: int, oh: int, ow: int
                 ) -> Tuple[int, int]:
    """(c_block, roi_block) for the ~16 MB scoped-VMEM budget AND MXU row
    utilization. Mosaic DOUBLE-BUFFERS input and output blocks, so the
    feature block costs 2*H*W*Cb bf16 even though its index is constant;
    the stacked (rb*oh, W*Cb) bf16 intermediate plus the output block are
    live per step. Oversizing surfaces as a scoped-vmem stack OOM at
    compile (observed at 544^2: 2x9.5 MB P2 block alone > 16 MB). The
    stacked-rows matmul wants rb*oh ~ 128 (full MXU rows), so smaller
    channel slabs that buy more rois per step win."""
    budget = 17 * 2**20
    # the out block's lane dim must be a multiple of 128 or the full C
    # (Mosaic block rule, enforced on device only)
    cands = [c] + [k for k in (256, 128) if k < c and c % k == 0]
    best = None
    best_rows = 0
    for cb in cands:
        feat_db = 2 * h * w * cb * 2
        if feat_db > budget - 2**20:
            continue
        rem = budget - feat_db
        # ~10 B/elem for the stacked intermediate (f32 dot result, bf16
        # copy, per-roi slice copies all live), calibrated on device
        # against the compiler's scoped-vmem accounting: P2/cb=128 rb=6
        # compiles, rb=8 reports 18.4M > 16M
        per_roi = oh * w * cb * 10 + 2 * oh * ow * cb * 4
        rb = int(min(rem // max(per_roi, 1), -(-128 // oh)))
        if rb >= 1:
            rows = min(rb * oh, 128)
            # prefer more MXU rows; tie-break on larger slabs (fewer
            # feature refetches)
            if rows > best_rows or (rows == best_rows
                                    and (best is None or cb > best[1])):
                best, best_rows = (rb, cb), rows
    if best is None:
        # even the smallest lane-legal channel slab (128) double-buffered
        # exceeds scoped VMEM (e.g. P2 of an 800x1333 bucket): launching
        # anyway would produce the compile-time OOM this sizing exists to
        # prevent — dispatch away from the kernel instead
        raise ValueError(
            f"roi_align_pallas: no (c_block, roi_block) fits the ~16 MB "
            f"scoped-VMEM budget for feature {h}x{w}x{c} -> {oh}x{ow}; "
            f"use multiscale_roi_align_separable for this shape")
    rb, cb = best
    return cb, rb


def roi_align_pallas(feat: jnp.ndarray, rois: jnp.ndarray,
                     out_size: Tuple[int, int], spatial_scale: float,
                     sampling_ratio: int = 2, roi_block: int = 0,
                     interpret: bool = False,
                     aligned: bool = False) -> jnp.ndarray:
    """feat (H, W, C); rois (R, 4) image-coord xyxy -> (R, oh, ow, C).
    ``roi_block=0`` (default) sizes the blocks to the VMEM budget."""
    oh, ow = out_size
    r = rois.shape[0]
    h, w, c = feat.shape
    cb, auto_rb = _pick_blocks(h, w, c, oh, ow)
    if roi_block <= 0:
        roi_block = auto_rb
    pad = (-r) % roi_block
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    n_blocks = (r + pad) // roi_block

    kernel = functools.partial(_kernel, oh=oh, ow=ow, h=h, w=w, cb=cb,
                               spatial_scale=spatial_scale,
                               sampling_ratio=sampling_ratio,
                               roi_block=roi_block, aligned=aligned)
    nc = c // cb
    # channel-slab-major layout (nc, H, W*Cb): one cheap XLA transpose so
    # each grid step reads a plain 2-D matmul operand
    feat_slabs = (feat.astype(jnp.bfloat16)
                  .reshape(h, w, nc, cb).transpose(2, 0, 1, 3)
                  .reshape(nc, h, w * cb))
    out = pl.pallas_call(
        kernel,
        grid=(nc, n_blocks),
        in_specs=[
            pl.BlockSpec((r + pad, 4), lambda ic, ir: (0, 0),
                         memory_space=pltpu.SMEM),
            # one channel slab, resident across all roi steps of this c step
            pl.BlockSpec((1, h, w * cb), lambda ic, ir: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((roi_block, oh * ow, cb),
                               lambda ic, ir: (ir, 0, ic),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + pad, oh * ow, c), jnp.float32),
        interpret=interpret,
    )(rois_p, feat_slabs)
    return out[:r].reshape(r, oh, ow, c).astype(feat.dtype)


# ---------------------------------------------------------------------------
# Differentiable wrapper (custom VJP) + multiscale dispatch
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align_tpu(feat: jnp.ndarray, rois: jnp.ndarray,
                  out_size: Tuple[int, int], spatial_scale: float,
                  sampling_ratio: int = 2, interpret: bool = False,
                  aligned: bool = False) -> jnp.ndarray:
    """Pallas roi_align with an analytic feature-gradient VJP."""
    return roi_align_pallas(feat, rois, out_size, spatial_scale,
                            sampling_ratio, interpret=interpret,
                            aligned=aligned)


def _roi_align_fwd(feat, rois, out_size, spatial_scale, sampling_ratio,
                   interpret, aligned):
    out = roi_align_pallas(feat, rois, out_size, spatial_scale,
                           sampling_ratio, interpret=interpret,
                           aligned=aligned)
    # zero-size marker carries feat's (H, W) and dtype statically
    marker = jnp.zeros(feat.shape[:2] + (0,), feat.dtype)
    return out, (rois, marker)


def _roi_align_bwd(out_size, spatial_scale, sampling_ratio, interpret,
                   aligned, residual, g):
    """dF[h,w,c] = sum_r By_r[y,h] * Bx_r[x,w] * g_r[y,x,c] — the exact
    transpose of the separable forward; two matmuls on the MXU. The
    (R, oh, W, C) intermediate is kept bf16 (halves its HBM traffic, and
    upstream grads are bf16 under the mixed-precision policy anyway); the
    second contraction folds (r, y) into one K dimension and accumulates
    f32. A chunked lax.scan variant was tried and traced SLOWER: its
    per-chunk accumulator re-read/write of the batched (B, H, W, C) f32
    dfeat cost more than the intermediate it saved."""
    from instancesegmentation_tpu.ops.roi_align import _interp_pool_matrix

    rois, marker = residual
    h, w, _ = marker.shape
    oh, ow = out_size
    roi = rois.astype(jnp.float32) * spatial_scale - (0.5 if aligned else 0.0)
    x1, y1 = roi[:, 0], roi[:, 1]
    roi_w, roi_h = roi[:, 2] - roi[:, 0], roi[:, 3] - roi[:, 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    by = _interp_pool_matrix(y1, roi_h / oh, h, oh,
                             sampling_ratio, jnp.float32)        # (R, oh, H)
    bx = _interp_pool_matrix(x1, roi_w / ow, w, ow,
                             sampling_ratio, jnp.float32)        # (R, ow, W)
    dtmp = jnp.einsum("rxw,ryxc->rywc", bx.astype(jnp.bfloat16),
                      g.astype(jnp.bfloat16),
                      preferred_element_type=jnp.bfloat16)       # (R,oh,W,C)
    dfeat = jnp.einsum("ryh,rywc->hwc", by.astype(jnp.bfloat16), dtmp,
                       preferred_element_type=jnp.float32)       # (H,W,C)
    return dfeat.astype(marker.dtype), jnp.zeros_like(rois)


roi_align_tpu.defvjp(_roi_align_fwd, _roi_align_bwd)


def multiscale_roi_align_pallas(feats: Sequence[jnp.ndarray],
                                rois: jnp.ndarray,
                                out_size: Tuple[int, int],
                                spatial_scales: Sequence[float],
                                sampling_ratio: int = 2,
                                interpret: bool = False,
                                aligned: bool = False) -> jnp.ndarray:
    """MultiScaleRoIAlign on the Pallas kernel (train + infer hot path).

    Same branch-free structure as multiscale_roi_align_separable: every
    level is computed and the canonical-level one-hot selects per roi —
    level cost scales with level H, so all four levels cost ~1.3x P2.
    """
    from instancesegmentation_tpu.ops.roi_align import fpn_level_assignment

    levels = fpn_level_assignment(rois)
    sel = jax.nn.one_hot(levels, len(feats), dtype=jnp.float32)   # (R, L)
    out = None
    for li, (f, sc) in enumerate(zip(feats, spatial_scales)):
        o = roi_align_tpu(f, rois, out_size, sc, sampling_ratio, interpret,
                          aligned)
        o = o * sel[:, li][:, None, None, None].astype(o.dtype)
        out = o if out is None else out + o
    return out
