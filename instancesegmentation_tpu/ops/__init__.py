"""Pure-jnp numeric ops shared by all model families.

Everything in this package is functional, shape-static, and jit-safe.
"""

from instancesegmentation_tpu.ops import anchors, boxes, losses, matcher, nms

__all__ = ["anchors", "boxes", "losses", "matcher", "nms"]
