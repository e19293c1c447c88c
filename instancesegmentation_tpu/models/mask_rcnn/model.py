"""Mask R-CNN neural modules (flax.linen, NHWC).

Topology mirrors the reference assembly
(/root/reference/inst_model/Mask_RCNN/net/network_files/
faster_rcnn_framework.py:255-364, mask_rcnn.py:97-252, backbone
resnet50_fpn_model.py, feature_pyramid_network.py):

  ResNet50 (C2..C5) -> FPN (256ch, P2..P5 + max-pool P6)
  RPNHead: shared 3x3 conv + 1x1 objectness / 1x1 deltas, all levels
  TwoMLPHead(1024) + FastRCNNPredictor(cls + per-class boxes)
  MaskHead: 4x conv256 + 2x deconv-upsample + 1x1 per-class 28^2 logits

The modules here are PURELY neural: proposal filtering, sampling, and
losses are functional code in proposals.py / roi_heads.py — that split is
what keeps the whole training step one traced XLA program with static
shapes (the reference interleaves python list manipulation with module
calls throughout).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from instancesegmentation_tpu.models.resnet import ResNet

NUM_ANCHORS_PER_CELL = 3     # ratios (0.5, 1, 2) x 1 size per level


class FPN4(nn.Module):
    """4-level FPN + LastLevelMaxPool (feature_pyramid_network.py:116-235)."""
    out_channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats) -> Tuple[jnp.ndarray, ...]:
        conv = partial(nn.Conv, dtype=self.dtype)
        inners = [conv(self.out_channels, (1, 1), name=f"inner{i}")(f)
                  for i, f in enumerate(feats)]
        # top-down nearest upsample + add
        outs = [inners[-1]]
        for i in range(len(inners) - 2, -1, -1):
            up = jax.image.resize(outs[0], inners[i].shape, method="nearest")
            outs.insert(0, inners[i] + up)
        outs = [conv(self.out_channels, (3, 3), padding=1, name=f"layer{i}")(o)
                for i, o in enumerate(outs)]
        # LastLevelMaxPool: stride-2 1x1 max pool (:227-235)
        pool = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return tuple(outs) + (pool,)


class RPNHead(nn.Module):
    """Shared conv head over all levels (rpn_function.py:211-243)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        conv3 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv")
        cls = nn.Conv(NUM_ANCHORS_PER_CELL, (1, 1), dtype=self.dtype,
                      name="cls_logits")
        reg = nn.Conv(NUM_ANCHORS_PER_CELL * 4, (1, 1), dtype=self.dtype,
                      name="bbox_pred")
        objectness, deltas = [], []
        for f in feats:
            t = nn.relu(conv3(f))
            b = f.shape[0]
            # (B, H, W, A) -> (B, H*W*A); ordering matches the anchor
            # generator (row-major cells, anchors innermost)
            objectness.append(cls(t).reshape(b, -1).astype(jnp.float32))
            deltas.append(reg(t).reshape(b, -1, 4).astype(jnp.float32))
        return (jnp.concatenate(objectness, axis=1),
                jnp.concatenate(deltas, axis=1))


class _FlattenDense(nn.Module):
    """Dense over the flattened trailing (h, w, c) WITHOUT flattening the
    activation. The (R, h*w*c) reshape merges the spatial dims into the
    tensor's minor dimension, which XLA realizes as a relayout COPY of the
    whole roi-feature tensor every step (part of the 7.8 ms/step copy
    category the round-3 trace attributed); contracting (h, w, c) directly
    in dot_general lets the compiler fold the transpose into the matmul's
    operand load instead. The param tree (kernel (h*w*c, out) + bias) is
    IDENTICAL to nn.Dense on the flattened input — checkpoints and the
    torch-weight converter (utils/torch_weights.py) are unaffected; the
    kernel's (h*w*c, out) -> (h, w, c, out) view splits MAJOR dims only,
    which is layout-free."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_swapped: bool = False):
        """``spatial_swapped``: the input's trailing dims are (w, h, c)
        instead of (h, w, c) — the level-sorted RoIAlign kernel's native
        cell order (ops/pallas/roi_align_sorted.py). The contraction maps
        them onto the kernel's swapped axes instead of un-transposing the
        big feature tensor in HBM first (~2 ms/call of pure copies on the
        b8 infer trace, PERF_NOTES round-5 floor table); the stored param
        stays the reference (h*w*c, out) layout either way."""
        h, w, c = x.shape[-3:]
        if spatial_swapped:
            w, h = h, w
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (h * w * c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kdims = (1, 0, 2) if spatial_swapped else (0, 1, 2)
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            kernel.reshape(h, w, c, self.features).astype(self.dtype),
            (((x.ndim - 3, x.ndim - 2, x.ndim - 1), kdims), ((), ())))
        return y + bias.astype(self.dtype)


class TwoMLPHead(nn.Module):
    """fc1024 -> fc1024 over roi features (faster_rcnn_framework.py:126-149;
    the reference flattens first — see _FlattenDense for why we contract
    the (7, 7, C) block directly)."""
    representation_size: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, spatial_swapped: bool = False):
        x = nn.relu(_FlattenDense(self.representation_size, dtype=self.dtype,
                                  name="fc6")(x, spatial_swapped))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    """cls logits + per-class box deltas (faster_rcnn_framework.py:152-172)."""
    num_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="cls_score")(x).astype(jnp.float32)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="bbox_pred")(x).astype(jnp.float32)
        return scores, deltas.reshape(x.shape[0], self.num_classes, 4)


class MaskHead(nn.Module):
    """4x 3x3 conv256 + 2x transposed-conv upsample + 1x1 logits
    (mask_rcnn.py:214-252: MaskRCNNHeads + MaskRCNNPredictor)."""
    num_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="conv5_mask")(x))
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="mask_fcn_logits")(x)
        return x.astype(jnp.float32)


class MaskRCNN(nn.Module):
    """Container exposing the neural pieces. ``backbone_fpn`` runs the
    image tower; head methods are called by the functional train/infer
    steps with RoI-aligned features."""
    num_classes: int                 # includes background
    train_mode: bool = True
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None
    frozen_bn: bool = False          # FrozenBatchNorm2d backbone option
                                     # (resnet50_fpn_model.py:146-148)
    remat_backbone: bool = False     # cfg.remat_backbone (HBM mode)

    def setup(self):
        self.body = ResNet(layers=(3, 4, 6, 3), out_stages=(1, 2, 3, 4),
                           dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                           frozen_bn=self.frozen_bn,
                           remat=self.remat_backbone, name="backbone")
        self.fpn = FPN4(dtype=self.dtype, name="fpn")
        self.rpn_head = RPNHead(dtype=self.dtype, name="rpn_head")
        self.box_head = TwoMLPHead(dtype=self.dtype, name="box_head")
        self.box_predictor = FastRCNNPredictor(self.num_classes,
                                               dtype=self.dtype,
                                               name="box_predictor")
        self.mask_head = MaskHead(self.num_classes, dtype=self.dtype,
                                  name="mask_head")

    def backbone_fpn(self, images, train: bool = False):
        """images (B,H,W,3) normalized -> 5 FPN levels (P2..P6)."""
        feats = self.body(images.astype(self.dtype), train=train)
        return self.fpn(feats)

    def rpn(self, feats):
        return self.rpn_head(feats)

    def box_forward(self, roi_feats, spatial_swapped: bool = False):
        """roi_feats (R, 7, 7, C) -> (scores (R,K), deltas (R,K,4)).
        ``spatial_swapped``: features arrive with (w, h) cell order (the
        sorted RoIAlign kernel's native layout) — see _FlattenDense."""
        return self.box_predictor(self.box_head(roi_feats.astype(self.dtype),
                                                spatial_swapped))

    def mask_forward(self, roi_feats):
        """roi_feats (R, 14, 14, C) -> logits (R, 28, 28, K)."""
        return self.mask_head(roi_feats.astype(self.dtype))

    def __call__(self, images, train: bool = False):
        """Init/tracing convenience: run every submodule once."""
        feats = self.backbone_fpn(images, train=train)
        obj, deltas = self.rpn(feats)
        r = images.shape[0]
        box_feats = jnp.zeros((r, 7, 7, feats[0].shape[-1]), images.dtype)
        scores, box_deltas = self.box_forward(box_feats)
        mask_feats = jnp.zeros((r, 14, 14, feats[0].shape[-1]), images.dtype)
        mask_logits = self.mask_forward(mask_feats)
        return feats, (obj, deltas), (scores, box_deltas), mask_logits
