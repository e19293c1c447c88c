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
            c: int, spatial_scale: float, sampling_ratio: int,
            roi_block: int, aligned: bool):
    """Grid: (num_roi_blocks,). rois_ref (roi_block, 4) SMEM;
    feat_ref (H, W*C) bf16 VMEM (same block every step);
    out (roi_block, oh*ow, C) f32."""
    s = sampling_ratio

    def interp_matrix(start, bin_size, size, out_bins):
        """(out_bins, size) pooling+interp operator for ONE roi, built from
        2-D integer iota only."""
        # sample coordinates, flattened (out_bins*s, 1)
        flat = jax.lax.broadcasted_iota(jnp.int32, (out_bins * s, 1), 0)
        bins = (flat // s).astype(jnp.float32)
        off = ((flat % s).astype(jnp.float32) + 0.5) / s
        coords = start + (bins + off) * bin_size            # (out_bins*s, 1)
        valid = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1)
        c0 = jnp.floor(cc)
        frac = cc - c0
        c0i = c0.astype(jnp.int32)
        c1i = jnp.minimum(c0i + 1, size - 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (out_bins * s, size), 1)
        m = ((iota == c0i) * (1.0 - frac)
             + (iota == c1i) * frac) * valid                 # (out_bins*s, size)
        # fold the bin average: sum the s sample rows per bin / s
        return jnp.mean(m.reshape(out_bins, s, size), axis=1)

    shift = 0.5 if aligned else 0.0
    for r in range(roi_block):                               # unrolled
        x1 = rois_ref[r, 0] * spatial_scale - shift
        y1 = rois_ref[r, 1] * spatial_scale - shift
        x2 = rois_ref[r, 2] * spatial_scale - shift
        y2 = rois_ref[r, 3] * spatial_scale - shift
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)

        by = interp_matrix(y1, roi_h / oh, h, oh)            # (oh, H)
        bx = interp_matrix(x1, roi_w / ow, w, ow)            # (ow, W)

        tmp = jnp.dot(by.astype(jnp.bfloat16), feat_ref[:],
                      preferred_element_type=jnp.float32)    # (oh, W*C)
        tmp = tmp.reshape(oh, w, c)
        out = jax.lax.dot_general(
            bx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (ow, oh, C)
        out_ref[r, :, :] = jnp.transpose(out, (1, 0, 2)).reshape(oh * ow, c)


def roi_align_pallas(feat: jnp.ndarray, rois: jnp.ndarray,
                     out_size: Tuple[int, int], spatial_scale: float,
                     sampling_ratio: int = 2, roi_block: int = 8,
                     interpret: bool = False,
                     aligned: bool = False) -> jnp.ndarray:
    """feat (H, W, C); rois (R, 4) image-coord xyxy -> (R, oh, ow, C)."""
    oh, ow = out_size
    r = rois.shape[0]
    h, w, c = feat.shape
    pad = (-r) % roi_block
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    n_blocks = (r + pad) // roi_block

    kernel = functools.partial(_kernel, oh=oh, ow=ow, h=h, w=w, c=c,
                               spatial_scale=spatial_scale,
                               sampling_ratio=sampling_ratio,
                               roi_block=roi_block, aligned=aligned)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((roi_block, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            # whole feature map resident in VMEM across all grid steps
            pl.BlockSpec((h, w * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((roi_block, oh * ow, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + pad, oh * ow, c), jnp.float32),
        interpret=interpret,
    )(rois_p, feat.astype(jnp.bfloat16).reshape(h, w * c))
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
    transpose of the separable forward; two matmuls on the MXU."""
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
    g32 = g.astype(jnp.float32)                                  # (R,oh,ow,C)
    dtmp = jnp.einsum("rxw,ryxc->rywc", bx, g32,
                      preferred_element_type=jnp.float32)        # (R,oh,W,C)
    dfeat = jnp.einsum("ryh,rywc->hwc", by, dtmp,
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
