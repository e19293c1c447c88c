"""Frozen-dataclass config system + registry.

Replaces the reference's effectful ``get_opts()`` Namespaces
(/root/reference/configs/yolact_base.py:13-195,
configs/mask_rcnn_base.py:13-194): configs here are pure data (no dataset
I/O, no writer creation at import — SURVEY §3.5's "make this a pure config
+ explicit init"). Knob names/values follow the reference so users can map
one-to-one; CLI overlays win over config values, as in train.py:28-29.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class Config:
    # identity / dispatch
    name: str = "yolact_base"
    net: str = "yolact"                    # 'yolact' | 'mask_rcnn'
    exp_name: str = "voc"                  # dataset: voc | coco | verseg | shape

    # data
    data_root: str = "./dataset"
    class_names: Tuple[str, ...] = ()      # resolved from model_data/*.txt when empty
    classes_path: str = ""
    input_shape: Tuple[int, int] = (544, 544)
    max_instances: int = 64                # static pad (reference: ragged)
    num_workers: int = 4
    cache_images: bool = False             # keep decoded frames in RAM after
                                           # epoch 1 (skips disk+decode;
                                           # ~0.9 MB/img at 544^2) — for
                                           # host-bound small/medium sets
    augment: bool = True                   # train-time Augmentation pipeline;
                                           # False = BaseTransform (resize
                                           # only) — diagnosis/memorization

    # model
    pretrained: bool = False
    model_path: str = ""
    anchors_size: Tuple[float, ...] = (24, 48, 96, 192, 384)  # configs/yolact_base.py:44
    coef_dim: int = 32
    # OPT-IN capability (DEVIATION, default off): add a second 2x upsample
    # stage to ProtoNet so prototypes land at input/2 instead of the
    # paper's input/4 (nets/yolact.py:70-93 → 138² at 550). The round-2
    # ceiling analysis (BASELINE.md "overfit gap") proved the mask-mAP
    # plateau is the proto resolution itself — the trained model beats the
    # binary gt oracle at input/4 — so this is the lever that raises it.
    # Costs ~4x in the proto head + mask assembly; changes the param tree
    # (one extra conv) so checkpoints don't interchange with the default.
    proto_double: bool = False
    # Mask R-CNN backbone construction (resnet50_fpn_model.py:137-199,
    # called with trainable_layers=3 at models/init_model.py:42):
    # trainable_layers counts from the top — ['layer4','layer3','layer2',
    # 'layer1','conv1'][:n] train, the rest are PERMANENTLY frozen
    # (+ 'bn1' only at n=5). frozen_bn selects FrozenBatchNorm2d semantics
    # (the reference docstring's own recommendation for small batches;
    # its live default is nn.BatchNorm2d).
    trainable_layers: int = 3
    frozen_bn: bool = False
    # OPT-IN perf mode (DEVIATION, default off): freeze backbone BN
    # STATISTICS during the freeze phase only — normalize with the stored
    # running stats instead of batch stats while the backbone is frozen
    # anyway. The reference keeps every BN module in train mode through
    # both phases (freeze only clears requires_grad, nets/yolact.py:207-213),
    # so its running stats drift even while frozen; this flag trades that
    # drift for removing the BN-statistics reduces — measured ~25% of the
    # YOLACT b8 train step (PERF_NOTES "live-BN wall"). Meaningful only
    # with pretrained/imported stats. Unfreeze phase is unaffected.
    freeze_phase_bn_stats: bool = False
    # OPT-IN memory mode (no numeric change): rematerialize backbone
    # bottleneck blocks in the backward pass (jax.checkpoint per block)
    # instead of keeping every stage activation live. Cuts unfreeze-phase
    # activation HBM (measured in PERF_NOTES "remat_backbone") for the
    # price of one extra backbone forward in backward — the standard
    # XLA/TPU FLOPs-for-HBM trade. Enables bigger unfreeze batches at the
    # 800-bucket operating point. Numerics are equivalent to float
    # round-off (the recomputed forward fuses differently — measured
    # <=3e-6 relative grad delta); the variable tree is unchanged, so
    # checkpoints interchange with the default.
    remat_backbone: bool = False
    # RoIAlign grid semantics: False = torchvision 0.4 (aligned=False),
    # the reference's pinned behavior, which carries a systematic ~0.5-px
    # feature-grid offset; True = half-pixel-corrected grid (later
    # torchvision / Detectron2 aligned=True). Applies to box/mask feature
    # pooling AND the 28^2 gt-mask projection.
    roi_align_aligned: bool = False

    # aspect-ratio grouped batching (configs/mask_rcnn_base.py:41,
    # models/init_model.py:98-125); -1 disables, k>=0 -> 2k+1 ratio bins
    aspect_ratio_group_factor: int = -1

    # resolution buckets (Mask R-CNN only): the static-shape analogue of
    # the reference's min800/max1333 dynamic resize + stride-32 pad
    # (transform.py:256-386). Each train image resizes aspect-preserving
    # into its nearest-ratio bucket and pads; one compiled step per bucket
    # shape. Empty tuple = single fixed square (input_shape). Dims should
    # be multiples of 64 (P2..P6 strides).
    resolution_buckets: Tuple[Tuple[int, int], ...] = ()

    # two-phase schedule (configs/yolact_base.py:75-83)
    init_epoch: int = 0
    freeze_epoch: int = 50
    unfreeze_epoch: int = 100
    freeze_batch_size: int = 14
    unfreeze_batch_size: int = 8
    freeze_train: bool = True

    # optimization (configs/yolact_base.py:96-131)
    init_lr: float = 1e-4
    min_lr_ratio: float = 0.01             # Min_lr = Init_lr * 0.01
    optimizer_type: str = "adam"
    momentum: float = 0.937
    weight_decay: float = 0.0
    lr_decay_type: str = "cos"

    # loss (yolact) — Multi_Loss(num_classes, anchors, 0.5, 0.4, 3)
    pos_thresh: float = 0.5
    neg_thresh: float = 0.4
    negpos_ratio: int = 3

    # runtime
    mixed_precision: bool = True           # bf16 compute (AMP analogue)
    ema: bool = True                       # ModelEMA (utils/helpers.py:34)
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    early_stopping: bool = True
    patience: int = 10                     # utils/helpers.py:230-240
    seed: int = 704                        # train.py:52 via configs/*:158
    out_root: str = "output"
    save_period: int = 1
    keep_epoch_checkpoints: bool = False  # per-epoch ep### snapshots
                                          # (reference saves them; off by
                                          # default to cut checkpoint I/O)

    # eval / inference (inst_model/yolact/yolact.py:22-60, eval.py:67-68)
    confidence: float = 0.5
    nms_iou: float = 0.3
    eval_confidence: float = 0.05
    eval_nms_iou: float = 0.5
    traditional_nms: bool = False
    top_k: int = 200
    max_detections: int = 100
    # Mask R-CNN box-head NMS candidate pool: torchvision runs ONE
    # batched_nms (class-offset trick) over every candidate above the
    # score threshold (roi_head.py:441-445, boxes.py:37-83); the
    # static-shape form pools the N highest-scored (proposal, class)
    # pairs first. 1024 = 10x headroom over the 100-detection output;
    # 0 = exhaustive per-class NMS over all proposals x classes
    # (identical results, ~20x the IoU work — see PERF_NOTES round 4).
    # Real-COCO regime note (round-4 advisor): with ~90 classes x 1000
    # proposals an imperfectly trained model can push >1024 pairs past
    # the 0.05 score gate; overflow silently drops the lowest-scored
    # candidates pre-NMS, unlike torchvision. Eval prints the measured
    # max/mean candidate counts and flags saturated images
    # (data/eval_runner.py) — raise this (or set 0) if it warns.
    box_nms_candidates: int = 1024
    eval_max_images: int = 100             # eval.py:62

    # parallelism: data axis size inferred from devices; mesh axes named
    # here so a model axis can be added without API changes
    mesh_axes: Tuple[str, ...] = ("data",)

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    @property
    def min_lr(self) -> float:
        return self.init_lr * self.min_lr_ratio

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32

    @property
    def proto_shape(self) -> Tuple[int, int]:
        # ProtoNet output = 2x P3 = input/4 (nets/yolact.py:144-148);
        # 4x P3 = input/2 under proto_double
        d = 2 if self.proto_double else 4
        return (self.input_shape[0] // d, self.input_shape[1] // d)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_REGISTRY: Dict[str, Callable[[], Config]] = {}


def register(name: str):
    def deco(fn: Callable[[], Config]):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_config(name: str, **overrides) -> Config:
    if name not in _REGISTRY:
        raise KeyError(f"unknown config {name!r}; have {sorted(_REGISTRY)}")
    cfg = _REGISTRY[name]()
    if overrides:
        cfg = cfg.replace(**overrides)
    if not cfg.class_names and cfg.classes_path:
        # resolve a class list file (model_data/*.txt, the reference's
        # get_classes — inst_model/yolact/utils/utils.py:27-31)
        with open(cfg.classes_path, encoding="utf-8") as f:
            names = tuple(c.strip() for c in f if c.strip())
        cfg = cfg.replace(class_names=names)
    return cfg


def list_configs():
    return sorted(_REGISTRY)


VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")


@register("yolact_base")
def _yolact_base() -> Config:
    """YOLACT-R50 on VOC (configs/yolact_base.py)."""
    return Config(name="yolact_base", net="yolact", exp_name="voc",
                  class_names=VOC_CLASSES)


@register("mask_rcnn_base")
def _mask_rcnn_base() -> Config:
    """Mask R-CNN R50-FPN on VOC (configs/mask_rcnn_base.py):
    freeze bs 4 / unfreeze bs 2, sgd lr 5e-3, momentum 0.9."""
    return Config(name="mask_rcnn_base", net="mask_rcnn", exp_name="voc",
                  class_names=VOC_CLASSES,
                  freeze_batch_size=4, unfreeze_batch_size=2,
                  init_lr=5e-3, optimizer_type="sgd", momentum=0.9,
                  weight_decay=5e-4, frozen_bn=True, max_instances=48,
                  aspect_ratio_group_factor=3)


@register("mask_rcnn_base800")
def _mask_rcnn_base800() -> Config:
    """mask_rcnn_base at the reference's REAL operating resolution: the
    dataset resizes to 544^2 but GeneralizedRCNNTransform(min_size=800,
    max_size=1333) upscales to ~800 inside the network for train AND
    inference (faster_rcnn_framework.py:257,362; transform.py:256-301).
    The static-shape analogue: three resolution buckets around 800 px
    chosen by aspect ratio, keep-aspect resize + pad, one compiled step
    per bucket."""
    return Config(name="mask_rcnn_base800", net="mask_rcnn", exp_name="voc",
                  class_names=VOC_CLASSES,
                  input_shape=(800, 800),
                  resolution_buckets=((800, 800), (640, 832), (832, 640)),
                  freeze_batch_size=4, unfreeze_batch_size=2,
                  init_lr=5e-3, optimizer_type="sgd", momentum=0.9,
                  weight_decay=5e-4, frozen_bn=True, max_instances=48,
                  aspect_ratio_group_factor=3)


@register("yolact_coco")
def _yolact_coco() -> Config:
    """YOLACT-R50 on COCO2017 (the reference's coco branch —
    annotation/coco.py, configs/yolact_base.py with exp_name='coco')."""
    return Config(name="yolact_coco", net="yolact", exp_name="coco",
                  classes_path="model_data/coco_classes.txt",
                  max_instances=96)


@register("mask_rcnn_coco")
def _mask_rcnn_coco() -> Config:
    return Config(name="mask_rcnn_coco", net="mask_rcnn", exp_name="coco",
                  classes_path="model_data/coco_classes.txt",
                  freeze_batch_size=4, unfreeze_batch_size=2,
                  init_lr=5e-3, optimizer_type="sgd", momentum=0.9,
                  weight_decay=5e-4, frozen_bn=True, max_instances=96,
                  aspect_ratio_group_factor=3)


@register("yolact_verseg")
def _yolact_verseg() -> Config:
    """Vertebra segmentation fine-tune (annotation/verseg.py, 1 class)."""
    return Config(name="yolact_verseg", net="yolact", exp_name="verseg",
                  class_names=("vertebra",), max_instances=32)


@register("mask_rcnn_verseg")
def _mask_rcnn_verseg() -> Config:
    return Config(name="mask_rcnn_verseg", net="mask_rcnn",
                  exp_name="verseg", class_names=("vertebra",),
                  freeze_batch_size=4, unfreeze_batch_size=2,
                  init_lr=5e-3, optimizer_type="sgd", momentum=0.9,
                  weight_decay=5e-4, frozen_bn=True, max_instances=32,
                  aspect_ratio_group_factor=3)


@register("yolact_synth")
def _yolact_synth() -> Config:
    """Tiny synthetic-shapes config for CI / smoke training."""
    from instancesegmentation_tpu.data.datasets import SHAPE_CLASSES
    return Config(name="yolact_synth", net="yolact", exp_name="shape",
                  data_root="/tmp/instseg_synth",
                  class_names=tuple(SHAPE_CLASSES),
                  input_shape=(160, 160), max_instances=8,
                  freeze_epoch=1, unfreeze_epoch=2,
                  # batch 16 = the whole synthetic train set per step; it
                  # also lifts the unfreeze adam LR to the reference's
                  # 1e-4 clamp (bs/nbs scaling, trainer.py:185-189) —
                  # at bs 4 the scaled LR (3e-5) cannot memorize the set
                  freeze_batch_size=16, unfreeze_batch_size=16,
                  num_workers=2, ema=False, early_stopping=False)


@register("mask_rcnn_synth_buckets")
def _mask_rcnn_synth_buckets() -> Config:
    """Bucketed-training smoke config: aspect-varied synthetic shapes,
    three small buckets (one compiled step per bucket). CI analogue of
    mask_rcnn_base800."""
    from instancesegmentation_tpu.data.datasets import SHAPE_CLASSES
    return Config(name="mask_rcnn_synth_buckets", net="mask_rcnn",
                  exp_name="shape",
                  data_root="/tmp/instseg_synth_ar",
                  class_names=tuple(SHAPE_CLASSES),
                  input_shape=(160, 160),
                  resolution_buckets=((160, 160), (128, 192), (192, 128)),
                  max_instances=8,
                  freeze_epoch=1, unfreeze_epoch=2,
                  freeze_batch_size=2, unfreeze_batch_size=2,
                  init_lr=5e-3, optimizer_type="sgd", momentum=0.9,
                  weight_decay=5e-4, num_workers=2, ema=False,
                  early_stopping=False, trainable_layers=5)


@register("mask_rcnn_synth")
def _mask_rcnn_synth() -> Config:
    from instancesegmentation_tpu.data.datasets import SHAPE_CLASSES
    return Config(name="mask_rcnn_synth", net="mask_rcnn", exp_name="shape",
                  data_root="/tmp/instseg_synth",
                  class_names=tuple(SHAPE_CLASSES),
                  input_shape=(160, 160), max_instances=8,
                  freeze_epoch=1, unfreeze_epoch=2,
                  freeze_batch_size=2, unfreeze_batch_size=2,
                  init_lr=5e-3, optimizer_type="sgd", momentum=0.9,
                  weight_decay=5e-4, num_workers=2, ema=False,
                  early_stopping=False,
                  # from-scratch training: no pretrained stem to freeze
                  trainable_layers=5)
