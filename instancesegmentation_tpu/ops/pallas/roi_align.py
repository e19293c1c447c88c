"""Pallas TPU RoIAlign kernel.

The Pallas backend for ops/roi_align.py (torchvision's C++/CUDA roi_align,
SURVEY §2.9's "single most important custom kernel"). Uses the same
separable-linear-operator math as ``roi_align_separable``:

    out_r = B_y(r) @ feat @ B_x(r)^T        (pooling folded into B)

but as a hand-scheduled kernel: the feature map is pinned in VMEM for the
whole grid (one HBM read total), each grid step processes a block of rois,
and the per-roi interpolation operators are built in-register from
broadcasted iota — no gathers anywhere, both contractions hit the MXU.

Numerics match torchvision roi_align with aligned=False, sampling_ratio=2
(verified against ops/roi_align.py's golden in tests). Forward-only: the
training path uses the jnp separable formulation (XLA already fuses its
backward well); this kernel serves inference where RoIAlign latency sits
between the box head and the mask head.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rois_ref, feat_ref, out_ref, *, oh: int, ow: int,
            spatial_scale: float, sampling_ratio: int, roi_block: int):
    """Grid: (num_roi_blocks,). rois_ref (roi_block, 4) VMEM;
    feat_ref (H, W, C) VMEM (same block every step); out (roi_block, oh*ow, C)."""
    h, w, c = feat_ref.shape
    s = sampling_ratio
    feat2d = feat_ref[:].reshape(h, w * c)

    rois = rois_ref[:].astype(jnp.float32) * spatial_scale   # (R, 4)
    x1, y1 = rois[:, 0], rois[:, 1]
    roi_w = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    roi_h = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)

    def interp_matrix(start, bin_size, size, out_bins):
        """(out_bins, size) pooling+interp operator for ONE roi."""
        off = (jax.lax.broadcasted_iota(jnp.float32, (out_bins, s), 1) + 0.5) / s
        bins = jax.lax.broadcasted_iota(jnp.float32, (out_bins, s), 0)
        coords = start + (bins + off) * bin_size             # (out_bins, s)
        valid = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1)
        c0 = jnp.floor(cc)
        frac = cc - c0
        c0i = c0.astype(jnp.int32)
        c1i = jnp.minimum(c0i + 1, size - 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (out_bins, s, size), 2)
        m = ((iota == c0i[..., None]) * (1.0 - frac[..., None])
             + (iota == c1i[..., None]) * frac[..., None])
        m = m * valid[..., None]
        return jnp.mean(m, axis=1)                           # (out_bins, size)

    for r in range(roi_block):                                # unrolled
        by = interp_matrix(y1[r], roi_h[r] / oh, h, oh)       # (oh, H)
        bx = interp_matrix(x1[r], roi_w[r] / ow, w, ow)       # (ow, W)
        tmp = jnp.dot(by, feat2d,
                      preferred_element_type=jnp.float32)     # (oh, W*C)
        tmp = tmp.reshape(oh, w, c)
        out = jax.lax.dot_general(
            bx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (ow, oh, C)
        out_ref[r, :, :] = jnp.transpose(out, (1, 0, 2)).reshape(oh * ow, c)


def roi_align_pallas(feat: jnp.ndarray, rois: jnp.ndarray,
                     out_size: Tuple[int, int], spatial_scale: float,
                     sampling_ratio: int = 2, roi_block: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """feat (H, W, C); rois (R, 4) image-coord xyxy -> (R, oh, ow, C)."""
    oh, ow = out_size
    r = rois.shape[0]
    h, w, c = feat.shape
    pad = (-r) % roi_block
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    n_blocks = (r + pad) // roi_block

    kernel = functools.partial(_kernel, oh=oh, ow=ow,
                               spatial_scale=spatial_scale,
                               sampling_ratio=sampling_ratio,
                               roi_block=roi_block)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((roi_block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # whole feature map resident in VMEM across all grid steps
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((roi_block, oh * ow, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + pad, oh * ow, c), jnp.float32),
        interpret=interpret,
    )(rois_p, feat.astype(jnp.float32))
    return out[:r].reshape(r, oh, ow, c).astype(feat.dtype)
