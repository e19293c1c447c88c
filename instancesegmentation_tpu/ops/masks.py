"""Mask ops (pure jnp): crop-to-box, resizes, instance-map assembly.

References:
* differentiable crop — /root/reference/inst_model/yolact/nets/
  yolact_training.py:100-113 and utils_bbox.py:154-168 (identical math).
* bilinear upsample of mask logits — utils_bbox.py:228 (F.interpolate
  bilinear, align_corners=False).

Layout note: the reference keeps masks (H, W, N); we keep (N, H, W) so the
trailing (H, W) dims tile cleanly onto the VPU (8x128 lanes) and batching
is a leading-dim vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_masks(masks: jnp.ndarray, boxes_px: jnp.ndarray) -> jnp.ndarray:
    """Zero mask values outside each box. masks (..., K, H, W); boxes (..., K, 4)
    in pixel units of the mask grid (x1, y1, x2, y2).

    Same half-open `[x1, x2)` comparisons as the reference crop.
    """
    h, w = masks.shape[-2], masks.shape[-1]
    rows = jnp.arange(w, dtype=boxes_px.dtype)               # x axis
    cols = jnp.arange(h, dtype=boxes_px.dtype)               # y axis
    x1 = boxes_px[..., 0][..., None, None]
    y1 = boxes_px[..., 1][..., None, None]
    x2 = boxes_px[..., 2][..., None, None]
    y2 = boxes_px[..., 3][..., None, None]
    in_x = (rows[None, :] >= x1) & (rows[None, :] < x2)       # (..., K, 1, W)->broadcast
    in_y = (cols[:, None] >= y1) & (cols[:, None] < y2)       # (..., K, H, 1)
    return masks * (in_x & in_y).astype(masks.dtype)


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize over the trailing two dims, torch align_corners=False
    semantics (jax.image 'linear' matches)."""
    out_shape = x.shape[:-2] + tuple(out_hw)
    return jax.image.resize(x, out_shape, method="linear")


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    out_shape = x.shape[:-2] + tuple(out_hw)
    return jax.image.resize(x, out_shape, method="nearest")


def downsample_binary_pool(masks: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Downsample binary masks by an integer factor via average pooling then
    >0.5, which equals torch bilinear downsample by the same factor followed
    by .gt(0.5) (yolact_training.py:272-274 at 2x). Shape (..., H, W)."""
    *lead, h, w = masks.shape
    x = masks.reshape(*lead, h // factor, factor, w // factor, factor)
    return (jnp.mean(x.astype(jnp.float32), axis=(-3, -1)) > 0.5).astype(jnp.float32)


def instance_argmax_map(masks_sigmoid: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel winning-instance index (utils_bbox.py:236), padded slots
    excluded. masks_sigmoid (K, H, W), valid (K,) -> (H, W) int32."""
    scores = jnp.where(valid[:, None, None], masks_sigmoid, -1.0)
    return jnp.argmax(scores, axis=0).astype(jnp.int32)
