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
from instancesegmentation_tpu.train.state import TrainState, ema_update


def make_yolact_train_step(model, tx, anchors, cfg):
    """Returns train_step(state, batch, rng) -> (state, metrics)."""
    anchors = jnp.asarray(anchors)

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(variables, batch["image"], train=True,
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
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, new_params, step, cfg.ema_decay, cfg.ema_tau)
        new_state = TrainState(step=step, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt,
                               ema_params=ema)
        metrics = dict(losses)
        metrics["total"] = total
        return new_state, metrics

    return train_step


def make_mask_rcnn_train_step(model, tx, cfg):
    """Mask R-CNN training step (loss dict summed, fit_mask_rcnn
    models/script.py:147-216 semantics: loss computed inside the network
    graph, grads through the sharded step)."""
    from instancesegmentation_tpu.models.mask_rcnn.meta import \
        make_mask_rcnn_train_fns
    loss_fn = make_mask_rcnn_train_fns(model, cfg, train=True)

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)   # on-device fold
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, step_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, new_params, step, cfg.ema_decay, cfg.ema_tau)
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
                              batch["image"], train=False)
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
