"""Jitted train/eval steps (YOLACT).

The TPU replacement for the reference's fit loops
(/root/reference/models/script.py:13-144 fit_yolact): one traced function
does forward + loss + backward + optimizer + EMA. Under a
``jax.sharding.Mesh`` with the batch sharded on the 'data' axis and
replicated params, XLA inserts the gradient all-reduces itself — the
NCCL/DDP machinery (trainer.py:112-143) has no explicit equivalent here.
BatchNorm means/vars are computed over the GLOBAL batch by GSPMD, i.e.
SyncBN (trainer.py:121-124) is the default behavior, not an option.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from instancesegmentation_tpu.models.yolact.loss import multi_loss
from instancesegmentation_tpu.ops.preprocess import (normalize_on_device,
                                                     unpack_mask_bits)
from instancesegmentation_tpu.train.state import (TrainState,
                                                  backbone_trainability,
                                                  ema_update)


def _freeze_guard(params, cfg, frozen_backbone: bool):
    """Per-leaf ``stop_gradient`` on frozen params — the torch
    ``requires_grad=False`` equivalent (nets/yolact.py:207-213,
    resnet50_fpn_model.py:163-180).

    The optimizer already zeroes frozen updates, but zeroing AFTER
    ``value_and_grad`` still pays for the frozen backward: for Mask R-CNN
    (conv1+layer1 permanently frozen, FrozenBN affine everywhere in the
    backbone) that is the entire lower-backbone filter/input-gradient
    chain computed and thrown away every step. ``stop_gradient`` gives
    those leaves symbolic-zero cotangents, so JAX's transpose pass prunes
    the dead backward ops at trace time — same numbers, less graph.
    """
    labels = backbone_trainability(
        params, frozen_backbone, net=cfg.net,
        trainable_layers=(cfg.trainable_layers if cfg.net == "mask_rcnn"
                          else 5),
        frozen_bn=cfg.frozen_bn)
    if all(v == "train" for v in
           jax.tree_util.tree_leaves(labels)):
        return params
    return jax.tree_util.tree_map(
        lambda lab, p: jax.lax.stop_gradient(p) if lab == "frozen" else p,
        labels, params)


def _apply_update(tx, grads, state: TrainState, cfg):
    """Optimizer + EMA: fused single-pass when tx is a FusedTx (one
    read-modify-write kernel per leaf, ~2.3 vs 6-10 ms/step on v5e —
    tools/bench_optimizer.py), optax chain otherwise."""
    step = state.step + 1
    if hasattr(tx, "apply_fused"):
        new_params, new_opt, ema = tx.apply_fused(
            grads, state.opt_state, state.params, state.ema_params,
            step, cfg.ema_decay, cfg.ema_tau)
    else:
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, new_params, step, cfg.ema_decay,
                             cfg.ema_tau)
    return step, new_params, new_opt, ema


def make_yolact_train_step(model, tx, anchors, cfg, frozen_backbone=False):
    """Returns train_step(state, batch, rng) -> (state, metrics)."""
    anchors = jnp.asarray(anchors)

    def loss_fn(raw_params, batch_stats, batch, rng):
        params = _freeze_guard(raw_params, cfg, frozen_backbone)
        variables = {"params": params, "batch_stats": batch_stats}
        # uint8 from the loader -> normalize here (ops/preprocess.py)
        image = normalize_on_device(batch["image"], "yolact")
        outputs, mutated = model.apply(variables, image, train=True,
                                       mutable=["batch_stats"])
        loss_batch = {"boxes": batch["boxes"], "labels": batch["labels"],
                      "masks": batch["masks"], "valid": batch["valid"],
                      "is_crowd": batch["is_crowd"], "anchors": anchors}
        losses = multi_loss(outputs, loss_batch, rng,
                            num_classes=cfg.num_classes + 1,
                            pos_thresh=cfg.pos_thresh,
                            neg_thresh=cfg.neg_thresh,
                            negpos_ratio=cfg.negpos_ratio)
        total = sum(losses.values())
        return total, (losses, mutated.get("batch_stats", batch_stats))

    def train_step(state: TrainState, batch, rng
                   ) -> Tuple[TrainState, Dict[str, Any]]:
        # fold the step count in ON DEVICE: a host-side fold_in per step is
        # its own tiny dispatch through the runtime (profiled at ~ms each)
        step_rng = jax.random.fold_in(rng, state.step)
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, step_rng)
        step, new_params, new_opt, ema = _apply_update(tx, grads, state, cfg)
        new_state = TrainState(step=step, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt,
                               ema_params=ema)
        metrics = dict(losses)
        metrics["total"] = total
        return new_state, metrics

    return train_step


def make_mask_rcnn_train_step(model, tx, cfg, frozen_backbone=False):
    """Mask R-CNN training step (loss dict summed, fit_mask_rcnn
    models/script.py:147-216 semantics: loss computed inside the network
    graph, grads through the sharded step)."""
    from instancesegmentation_tpu.models.mask_rcnn.meta import \
        make_mask_rcnn_train_fns
    inner_loss = make_mask_rcnn_train_fns(model, cfg, train=True)

    def loss_fn(raw_params, batch_stats, batch, rng):
        batch = dict(batch,
                     image=normalize_on_device(batch["image"], "mask_rcnn"),
                     masks=unpack_mask_bits(batch["masks"],
                                            batch["image"].shape[2]))
        return inner_loss(_freeze_guard(raw_params, cfg, frozen_backbone),
                          batch_stats, batch, rng)

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)   # on-device fold
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, step_rng)
        step, new_params, new_opt, ema = _apply_update(tx, grads, state, cfg)
        new_state = TrainState(step=step, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt,
                               ema_params=ema)
        metrics = dict(losses)
        metrics["total"] = total
        return new_state, metrics

    return train_step


def make_mask_rcnn_eval_step(model, cfg, use_ema: bool):
    from instancesegmentation_tpu.models.mask_rcnn.meta import \
        make_mask_rcnn_train_fns
    loss_fn = make_mask_rcnn_train_fns(model, cfg, train=False)

    def eval_step(state: TrainState, batch, rng):
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        batch = dict(batch,
                     image=normalize_on_device(batch["image"], "mask_rcnn"),
                     masks=unpack_mask_bits(batch["masks"],
                                            batch["image"].shape[2]))
        total, (losses, _) = loss_fn(params, state.batch_stats, batch, rng)
        out = dict(losses)
        out["total"] = total
        return out

    return eval_step


def make_yolact_eval_step(model, anchors, cfg, use_ema: bool):
    """Val-loss step (script.py:84-123): forward with frozen BN stats +
    the same loss; uses EMA weights when enabled (:90-93)."""
    anchors = jnp.asarray(anchors)

    def eval_step(state: TrainState, batch, rng) -> Dict[str, Any]:
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        outputs = model.apply({"params": params,
                               "batch_stats": state.batch_stats},
                              normalize_on_device(batch["image"], "yolact"),
                              train=False)
        loss_batch = {"boxes": batch["boxes"], "labels": batch["labels"],
                      "masks": batch["masks"], "valid": batch["valid"],
                      "is_crowd": batch["is_crowd"], "anchors": anchors}
        losses = multi_loss(outputs, loss_batch, rng,
                            num_classes=cfg.num_classes + 1,
                            pos_thresh=cfg.pos_thresh,
                            neg_thresh=cfg.neg_thresh,
                            negpos_ratio=cfg.negpos_ratio)
        losses["total"] = sum(losses.values())
        return losses

    return eval_step
