"""ResNet backbones (flax.linen, NHWC).

Replicates the topology of the reference's two ResNet50s:
* YOLACT backbone — /root/reference/inst_model/yolact/nets/resnet.py
  (torchvision v1.5-style bottleneck: stride on the 3x3 conv), returning
  the last three stage features C3/C4/C5.
* Mask R-CNN backbone — .../Mask_RCNN/net/backbone/resnet50_fpn_model.py
  (same topology, frozen-BN option, returns C2..C5 for the 4-level FPN).

TPU-first choices: NHWC layout, bf16 compute with f32 params and f32 BN
statistics, no in-place anything. BatchNorm supports a cross-replica
``axis_name`` (the TPU equivalent of SyncBatchNorm, trainer.py:121-124).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class S2DStemConv(nn.Module):
    """The stem 7x7/s2 conv computed as an EXACT 4x4/s1 conv on 2x2
    space-to-depth input (the MLPerf-ResNet TPU trick).

    Strided large-kernel convs on a 3-channel input lower poorly on
    TPU — traced ~1.4 ms/step of input layout copies and weight-grad
    fusions at 544^2 b8. Derivation: out(y) = sum_k w[k] in(2y+k-3);
    pad w to 8 taps with one leading zero (w8[k+1]=w[k]) so
    out(y) = sum_{k8} w8[k8] in(2y+k8-4); substituting the s2d
    coordinates u = 2Y+d gives k8 = 2j+d with j = Y-y+2 in {0..3},
    i.e. a 4-tap stride-1 conv over s2d rows with padding (2, 1).
    Identical math per axis for columns. The parameter keeps nn.Conv's
    name/shape (kernel (7,7,Cin,F)) so checkpoints and torch-weight
    imports are unchanged; the rearranged 4x4x(4*Cin) kernel is rebuilt
    from it in-graph (a tiny pad+reshape).
    """
    features: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features), jnp.float32)
        if h % 2 or w % 2:
            # odd input: direct 7x7/s2 conv with the SAME kernel param —
            # a separate nn.Conv here would make the parameter tree depend
            # on input parity (checkpoint incompatibility across shapes)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))   # (8,8,C,F)
        # (8,8,C,F) -> (4,dy, 4,dx, C,F) -> (4,4, dy,dx,C, F)
        k2 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin,
                                                    self.features)
        xs = x.reshape(b, h // 2, 2, w // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                    4 * cin)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k2.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut."""
    planes: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.planes * 4

        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = self.norm(name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Staged ResNet; returns the features of the stages in ``out_stages``
    (1-based: stage 1 = C2 ... stage 4 = C5)."""
    layers: Sequence[int] = (3, 4, 6, 3)
    out_stages: Sequence[int] = (2, 3, 4)   # yolact: C3, C4, C5
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9                # torch momentum 0.1
    bn_axis_name: Optional[str] = None      # set for cross-replica SyncBN
    # FrozenBatchNorm2d semantics (resnet50_fpn_model.py:5, torchvision
    # ops.misc): normalize with the stored statistics even in train mode
    # and never update them. The variable tree is IDENTICAL to live BN
    # (scale/bias params + mean/var batch_stats), so checkpoints and torch
    # imports are interchangeable; the affine params are excluded from
    # updates by the optimizer label tree (train/state.py).
    frozen_bn: bool = False
    # Rematerialize each bottleneck block in the backward pass
    # (cfg.remat_backbone): only block-boundary activations stay live,
    # everything inside a block is recomputed when its gradient runs.
    # nn.remat keeps the module scope, so the variable tree is unchanged.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        bn_train = train and not self.frozen_bn
        norm = partial(nn.BatchNorm, use_running_average=not bn_train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       axis_name=self.bn_axis_name if bn_train else None)

        y = S2DStemConv(64, dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        outs = []
        planes = 64
        for stage_i, blocks in enumerate(self.layers):
            stride = 1 if stage_i == 0 else 2
            for block_i in range(blocks):
                y = block_cls(planes, stride if block_i == 0 else 1,
                              dtype=self.dtype, norm=norm,
                              name=f"layer{stage_i + 1}_{block_i}")(y)
            outs.append(y)
            planes *= 2
        return tuple(outs[s - 1] for s in self.out_stages)


def resnet50_yolact(dtype=jnp.bfloat16, bn_axis_name=None) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), out_stages=(2, 3, 4), dtype=dtype,
                  bn_axis_name=bn_axis_name)


def resnet50_rcnn(dtype=jnp.bfloat16, bn_axis_name=None,
                  frozen_bn=False) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), out_stages=(1, 2, 3, 4), dtype=dtype,
                  bn_axis_name=bn_axis_name, frozen_bn=frozen_bn)
