"""Loss primitives shared by both model families (pure jnp).

References:
* smooth-L1 (sum) — torch F.smooth_l1_loss semantics used by YOLACT's bbox
  loss (/root/reference/inst_model/yolact/nets/yolact_training.py:192-195);
  beta variant — .../Mask_RCNN/net/network_files/det_utils.py:397-408.
* cross-entropy / BCE-with-logits — torch functional semantics used all
  over both loss stacks.

All reductions are explicit and mask-aware: every op takes a weight/mask so
padded slots contribute exactly zero (the reference relies on ragged
tensors instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber). beta=1 matches torch default."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-example CE with integer labels (torch F.cross_entropy, no reduction).

    Out-of-range labels (e.g. -1 padding) must be masked by the caller; we
    clamp them to 0 so the gather stays in bounds.
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    # one-hot multiply-sum instead of take_along_axis: the per-element
    # gather lowers to a slow fusion on TPU (traced ~1.4 ms/step over
    # B x 18525 anchors); the one-hot form is a fused elementwise+reduce
    picked = jnp.sum(
        logits * jax.nn.one_hot(safe, logits.shape[-1], dtype=logits.dtype),
        axis=-1)
    return logz - picked


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (numerically stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.where(mask, x, 0.0))
