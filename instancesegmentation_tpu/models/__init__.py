"""Model families: YOLACT and Mask R-CNN (flax.linen, NHWC, bf16-friendly).

``get_model(cfg)`` mirrors the reference registry
(/root/reference/models/init_model.py:30-54) by dispatching on the
config's ``net`` field.
"""

from __future__ import annotations


def get_model(cfg, train_mode: bool = True, frozen_bn: bool = None):
    """Build the flax module for a config (dispatch on cfg.net).

    ``frozen_bn`` overrides the config's BN-freeze choice for this module
    instance (used by the trainer to build a frozen-stats freeze-phase
    step under ``cfg.freeze_phase_bn_stats``); variable trees are
    identical either way.
    """
    if cfg.net == "yolact":
        from instancesegmentation_tpu.models.yolact.model import Yolact
        return Yolact(num_classes=cfg.num_classes + 1,
                      train_mode=train_mode,
                      dtype=cfg.compute_dtype,
                      frozen_bn=cfg.frozen_bn if frozen_bn is None
                      else bool(frozen_bn),
                      proto_double=cfg.proto_double,
                      # remat only pays off when a backward pass exists
                      remat_backbone=cfg.remat_backbone and train_mode)
    if cfg.net == "mask_rcnn":
        from instancesegmentation_tpu.models.mask_rcnn.model import MaskRCNN
        return MaskRCNN(num_classes=cfg.num_classes + 1,
                        train_mode=train_mode,
                        dtype=cfg.compute_dtype,
                        frozen_bn=cfg.frozen_bn if frozen_bn is None
                        else bool(frozen_bn),
                        remat_backbone=cfg.remat_backbone and train_mode)
    raise ValueError(f"unknown net: {cfg.net!r}")


def get_predictor(cfg, **kw):
    """Predictor factory — the reference's ``opt.Model_Pred`` binding
    (configs/yolact_base.py:177-179, configs/mask_rcnn_base.py:172-174)."""
    if cfg.net == "yolact":
        from instancesegmentation_tpu.models.yolact.predictor import YolactPredictor
        return YolactPredictor(cfg, **kw)
    if cfg.net == "mask_rcnn":
        from instancesegmentation_tpu.models.mask_rcnn.predictor import \
            MaskRCNNPredictor
        return MaskRCNNPredictor(cfg, **kw)
    raise ValueError(f"unknown net: {cfg.net!r}")
