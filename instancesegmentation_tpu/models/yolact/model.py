"""YOLACT in flax.linen (NHWC, bf16 compute / f32 params).

Topology mirrors /root/reference/inst_model/yolact/nets/yolact.py:
ResNet50 -> FPN(P3..P7, 256ch) -> ProtoNet (32 prototypes @ 4x P3 res)
+ one prediction head SHARED across all 5 levels (box / class / coef)
+ semantic-seg conv on P3 (train only).

TPU-first deltas from the reference (behavior-preserving):
* NHWC everywhere; per-level head outputs reshape to (B, cells*ar, ·) and
  concatenate — same anchor ordering as the reference's permute+reshape
  (yolact.py:114-121) because both are row-major over (y, x, ar).
* eval mode returns softmaxed classes like yolact.py:204; train mode
  returns the raw 5-tuple.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from instancesegmentation_tpu.models.resnet import ResNet

NUM_AR = 3          # aspect ratios {1, 1/2, 2} (yolact.py:97)
COEF_DIM = 32       # prototype count (yolact.py:124)


def _upsample_nearest(x: jnp.ndarray, hw) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]),
                            method="nearest")


class FPN(nn.Module):
    """P3..P7 from C3..C5 (yolact.py:8-68)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats) -> Tuple[jnp.ndarray, ...]:
        c3, c4, c5 = feats
        conv = partial(nn.Conv, dtype=self.dtype)
        p5 = conv(256, (1, 1), name="lat2")(c5)
        p4 = conv(256, (1, 1), name="lat1")(c4)
        p3 = conv(256, (1, 1), name="lat0")(c3)

        p4 = p4 + _upsample_nearest(p5, c4.shape[1:3])
        p3 = p3 + _upsample_nearest(p4, c3.shape[1:3])

        p5 = nn.relu(conv(256, (3, 3), padding=1, name="pred2")(p5))
        p4 = nn.relu(conv(256, (3, 3), padding=1, name="pred1")(p4))
        p3 = nn.relu(conv(256, (3, 3), padding=1, name="pred0")(p3))

        p6 = nn.relu(conv(256, (3, 3), strides=(2, 2), padding=1, name="down0")(p5))
        p7 = nn.relu(conv(256, (3, 3), strides=(2, 2), padding=1, name="down1")(p6))
        return p3, p4, p5, p6, p7


class ProtoNet(nn.Module):
    """3x conv -> 2x nearest upsample -> conv -> 1x1 to coef_dim, all ReLU
    (yolact.py:70-93). Output (B, 2*H3, 2*W3, coef_dim).

    ``double=True`` (cfg.proto_double, opt-in deviation) inserts a second
    upsample+conv stage before the 1x1, moving prototypes from input/4 to
    input/2 — the mask-resolution ceiling lever identified by the round-2
    oracle analysis (BASELINE.md)."""
    coef_dim: int = COEF_DIM
    dtype: Any = jnp.bfloat16
    double: bool = False

    @nn.compact
    def __call__(self, p3):
        conv = partial(nn.Conv, dtype=self.dtype)
        y = p3
        for i in range(3):
            y = nn.relu(conv(256, (3, 3), padding=1, name=f"proto1_{i}")(y))
        y = _upsample_nearest(y, (y.shape[1] * 2, y.shape[2] * 2))
        y = nn.relu(conv(256, (3, 3), padding=1, name="proto2_0")(y))
        if self.double:
            y = _upsample_nearest(y, (y.shape[1] * 2, y.shape[2] * 2))
            y = nn.relu(conv(256, (3, 3), padding=1, name="proto3_0")(y))
        y = nn.relu(conv(self.coef_dim, (1, 1), name="proto2_1")(y))
        return y


class PredictionHead(nn.Module):
    """Shared head: upfeature conv + box/conf/coef branches (yolact.py:96-121)."""
    num_classes: int
    coef_dim: int = COEF_DIM
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        conv = partial(nn.Conv, dtype=self.dtype)
        y = nn.relu(conv(256, (3, 3), padding=1, name="upfeature")(x))
        box = conv(NUM_AR * 4, (3, 3), padding=1, name="bbox")(y)
        conf = conv(NUM_AR * self.num_classes, (3, 3), padding=1, name="conf")(y)
        coef = nn.tanh(conv(NUM_AR * self.coef_dim, (3, 3), padding=1, name="coef")(y))
        # NHWC -> (B, H*W*ar, ch): same anchor order as reference permute+reshape
        return (box.reshape(b, -1, 4),
                conf.reshape(b, -1, self.num_classes),
                coef.reshape(b, -1, self.coef_dim))


class Yolact(nn.Module):
    """Full YOLACT network.

    train mode -> (boxes, classes, coefs, proto, segs)
    eval mode  -> (boxes, softmax(classes), coefs, proto)
    """
    num_classes: int                      # includes background
    coef_dim: int = COEF_DIM
    train_mode: bool = True
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    # FrozenBatchNorm semantics for the backbone (normalize with running
    # stats even under train=True, never update them). Variable tree is
    # identical to live BN, so a frozen-bn module can apply the same
    # checkpoint — used by cfg.freeze_phase_bn_stats (opt-in perf mode,
    # deviates from the reference which keeps BN live in both phases).
    frozen_bn: bool = False
    proto_double: bool = False            # cfg.proto_double (input/2 protos)
    remat_backbone: bool = False          # cfg.remat_backbone (HBM mode)

    def setup(self):
        self.backbone = ResNet(layers=(3, 4, 6, 3), out_stages=(2, 3, 4),
                               dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                               frozen_bn=self.frozen_bn,
                               remat=self.remat_backbone,
                               name="backbone")
        self.fpn = FPN(dtype=self.dtype, name="fpn")
        self.proto_net = ProtoNet(self.coef_dim, dtype=self.dtype,
                                  double=self.proto_double, name="proto_net")
        self.head = PredictionHead(self.num_classes, self.coef_dim,
                                   dtype=self.dtype, name="head")
        self.semantic_seg = nn.Conv(self.num_classes - 1, (1, 1),
                                    dtype=self.dtype, name="semantic_seg")

    def __call__(self, images, train: bool = False):
        """images: (B, H, W, 3) float32, already normalized."""
        feats = self.backbone(images.astype(self.dtype), train=train)
        levels = self.fpn(feats)

        proto = self.proto_net(levels[0]).astype(jnp.float32)

        boxes, classes, coefs = [], [], []
        for f in levels:
            b, c, k = self.head(f)
            boxes.append(b)
            classes.append(c)
            coefs.append(k)
        boxes = jnp.concatenate(boxes, axis=1).astype(jnp.float32)
        classes = jnp.concatenate(classes, axis=1).astype(jnp.float32)
        coefs = jnp.concatenate(coefs, axis=1).astype(jnp.float32)

        if self.train_mode:
            segs = self.semantic_seg(levels[0]).astype(jnp.float32)
            return boxes, classes, coefs, proto, segs
        return boxes, jax.nn.softmax(classes, axis=-1), coefs, proto
