"""Two-phase training orchestrator.

The TPU-native counterpart of /root/reference/trainer.py (Trainer, :24-222)
+ models/script.py fit loops: freeze/unfreeze phases with per-phase batch
size and LR rescaling, cosine/step schedules, EMA, early stopping (unfreeze
phase only), per-epoch checkpoints with best/last aliases, non-finite loss
abort, TensorBoard scalars with Freeze_/UnFreeze_ prefixes.

What does NOT exist here, by design (SURVEY §2.7-2.8): DDP/DataParallel
wrappers, NCCL init, SyncBN conversion, GradScaler, reduce_dict, barriers.
The mesh + sharded batches + jit give all of it. The phase switch swaps
the optax transform (same param tree), so both phases are two compiled
functions — no Python-level model surgery (the reference rebuilds
optimizers and loaders mid-run, trainer.py:172-207; we do the same but
nothing is mutated in place).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.config import Config
from instancesegmentation_tpu.data.augment import Augmentation, BaseTransform
from instancesegmentation_tpu.data.datasets import (SegDataset, get_annotation,
                                                    synthetic_annotation)
from instancesegmentation_tpu.data.loader import (Loader, RcnnCollate,
                                                  YolactCollate)
from instancesegmentation_tpu.models import get_model
from instancesegmentation_tpu.ops.anchors import yolact_anchors
from instancesegmentation_tpu.parallel import make_mesh, shard_batch
from instancesegmentation_tpu.train import schedules
from instancesegmentation_tpu.train.checkpoints import CheckpointIO
from instancesegmentation_tpu.train.metrics import LossHistory, MetricWriter
from instancesegmentation_tpu.train.state import (TrainState,
                                                  create_train_state,
                                                  make_phase_optimizer)
from instancesegmentation_tpu.train.steps import (make_mask_rcnn_eval_step,
                                                  make_mask_rcnn_train_step,
                                                  make_yolact_eval_step,
                                                  make_yolact_train_step)
from instancesegmentation_tpu.utils.device import host_feed_only

log = logging.getLogger("instseg")


def jnp_copy(x):
    import jax.numpy as jnp
    return jnp.copy(x) if hasattr(x, "dtype") else x


class Trainer:
    def __init__(self, cfg: Config, resume: bool = False,
                 max_steps_per_epoch: Optional[int] = None):
        self.cfg = cfg
        self.max_steps_per_epoch = max_steps_per_epoch
        self.out_dir = os.path.join(cfg.out_root, cfg.name)
        os.makedirs(self.out_dir, exist_ok=True)
        _init_logging(self.out_dir)

        self.mesh = make_mesh(axes=cfg.mesh_axes)
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        log.info("mesh: %s over %d device(s)", cfg.mesh_axes, self.n_devices)

        # ---- data ------------------------------------------------------
        if cfg.exp_name == "shape":
            # bucketed smoke runs need non-square images for the bucket
            # assignment to be non-trivial
            self.ann = synthetic_annotation(
                cfg.data_root, vary_aspect=bool(cfg.resolution_buckets))
        else:
            self.ann = get_annotation(cfg.exp_name, cfg.data_root,
                                      list(cfg.class_names))
        if cfg.resolution_buckets and cfg.net != "mask_rcnn":
            raise ValueError("resolution_buckets requires net='mask_rcnn' "
                             "(YOLACT anchors/proto are input-shape bound)")
        keep_aspect = bool(cfg.resolution_buckets)
        train_tf = (Augmentation if cfg.augment else BaseTransform)(
            cfg.input_shape, keep_aspect=keep_aspect)
        self.train_ds = SegDataset(
            self.ann.train_image_path, self.ann.train_coco,
            self.ann.label_map, transform=train_tf,
            cache_images=cfg.cache_images)
        # val geometry matches train: under buckets, keep-aspect fit+pad
        # into input_shape (GeneralizedRCNNTransform applies the same
        # resize at train and eval, reference transform.py:256-301)
        self.val_ds = SegDataset(self.ann.val_image_path, self.ann.val_coco,
                                 self.ann.label_map,
                                 transform=BaseTransform(
                                     cfg.input_shape,
                                     keep_aspect=keep_aspect))
        if cfg.net == "yolact":
            self.collate = YolactCollate(cfg.max_instances, cfg.proto_shape)
        else:
            self.collate = RcnnCollate(cfg.max_instances)

        # ---- model / anchors --------------------------------------------
        self.model = get_model(cfg, train_mode=True)
        self.anchors = (yolact_anchors(cfg.input_shape, cfg.anchors_size)
                        if cfg.net == "yolact" else None)

        # ---- phase setup -------------------------------------------------
        self.frozen = bool(cfg.freeze_train)
        batch = cfg.freeze_batch_size if self.frozen else cfg.unfreeze_batch_size
        self.batch_size = self._fit_batch(batch)
        init_fit, min_fit = schedules.scale_lr_freeze(
            self.batch_size, cfg.init_lr, cfg.min_lr)
        self.lr_func = schedules.get_lr_scheduler(
            cfg.lr_decay_type, init_fit, min_fit, cfg.unfreeze_epoch)

        rng = jax.random.key(cfg.seed)
        sample = np.zeros((self.batch_size,) + tuple(cfg.input_shape) + (3,),
                          np.float32)
        self.state = create_train_state(self.model, cfg, rng, sample,
                                        init_fit, self.frozen, mesh=self.mesh)
        if cfg.pretrained and cfg.model_path:
            # reference loads torch resnet50 weights into the backbone with
            # a shape-filtered merge (trainer.py:59-69, yolact.py:131-133),
            # or a FULL COCO-pretrained Mask R-CNN dropping the predictor
            # heads (mask_rcnn.py:202-209). Dispatch on the .pth contents.
            import torch
            from instancesegmentation_tpu.utils import torch_weights as tw
            sd = torch.load(cfg.model_path, map_location="cpu",
                            weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            if "backbone.body.conv1.weight" in sd:      # full Mask R-CNN
                mp, ms = tw.convert_maskrcnn_state_dict(sd)
                new_params = tw.merge_params(self.state.params, mp)
                new_stats = tw.merge_params(self.state.batch_stats, ms)
            else:                                        # backbone-only
                bp, bs = tw.convert_resnet50_state_dict(sd)
                new_params, new_stats = tw.merge_backbone_params(
                    self.state.params, bp, self.state.batch_stats, bs)
            self.state = self.state.replace(params=new_params,
                                            batch_stats=new_stats)
            log.info("loaded pretrained weights from %s", cfg.model_path)
        try:
            # torchinfo-equivalent dump (utils/utils_info.py:6-14)
            from instancesegmentation_tpu.utils.summary import write_info
            write_info(get_model(cfg, train_mode=False),
                       np.zeros((1,) + tuple(cfg.input_shape) + (3,),
                                np.float32), self.out_dir)
        except Exception as e:       # summary is best-effort
            log.warning("model summary failed: %s", e)
        self.tx = make_phase_optimizer(cfg, init_fit, self.frozen,
                                       self.state.params)
        self._build_steps()

        # ---- bookkeeping -------------------------------------------------
        self.writer = MetricWriter(self.out_dir)
        self.history = LossHistory(self.writer, freeze_flag=self.frozen,
                                   patience=cfg.patience)
        self.ckpt = CheckpointIO(os.path.join(self.out_dir, "ckpt"))
        self.start_epoch = cfg.init_epoch
        if resume:
            name = self.ckpt.latest_epoch_name()
            if name:
                try:
                    self.state = self.ckpt.restore(name, self.state)
                except ValueError:
                    # cross-phase checkpoint: opt_state tree differs between
                    # freeze (multi_transform) and unfreeze phases — restore
                    # raw and rebuild the optimizer state fresh
                    raw = self.ckpt.restore_raw(name)
                    self.state = self.state.replace(
                        step=jnp.asarray(raw["step"], jnp.int32),
                        params=raw["params"],
                        batch_stats=raw.get("batch_stats") or {},
                        ema_params=raw.get("ema_params")
                        if self.state.ema_params is not None else None)
                    log.warning("resume: checkpoint is from the other "
                                "training phase; optimizer state reset")
                meta = self.ckpt.load_meta(name)
                if meta is not None and "epoch" in meta:
                    # saved-epoch record: exact across the phase switch,
                    # where steps-per-epoch changes with the batch size
                    self.start_epoch = int(meta["epoch"]) + 1
                else:
                    self.start_epoch = int(self.state.step) // max(
                        1, len(self.train_ds) // self.batch_size)
                if (self.frozen and meta is not None
                        and meta.get("frozen") is False):
                    # checkpoint was saved in the unfreeze phase: do the
                    # phase switch NOW, carrying the restored optimizer
                    # moments through it — the epoch-loop switch would
                    # tx.init-reset them (opt-state trees are structurally
                    # identical across phases, so the restore above
                    # already holds the unfreeze-phase moments)
                    restored_opt = self.state.opt_state
                    self._switch_to_unfreeze()
                    self.state = self.state.replace(opt_state=restored_opt)
                log.info("resumed from %s at epoch %d", name, self.start_epoch)

    # ------------------------------------------------------------------
    def _fit_batch(self, b: int) -> int:
        """Round the global batch up to a multiple of the device count."""
        return max(b, -(-b // self.n_devices) * self.n_devices)

    def _build_steps(self):
        # cfg.freeze_phase_bn_stats: the freeze-phase step applies a
        # frozen-stats clone of the model (identical variable tree); the
        # unfreeze phase rebuilds with live BN as usual
        step_model = self.model
        if self.frozen and getattr(self.cfg, "freeze_phase_bn_stats", False):
            step_model = get_model(self.cfg, train_mode=True, frozen_bn=True)
        if self.cfg.net == "yolact":
            train_step = make_yolact_train_step(step_model, self.tx,
                                                self.anchors, self.cfg,
                                                frozen_backbone=self.frozen)
            eval_step = make_yolact_eval_step(self.model, self.anchors,
                                              self.cfg, use_ema=self.cfg.ema)
        else:
            train_step = make_mask_rcnn_train_step(step_model, self.tx,
                                                   self.cfg,
                                                   frozen_backbone=self.frozen)
            eval_step = make_mask_rcnn_eval_step(self.model, self.cfg,
                                                 use_ema=self.cfg.ema)
        self.train_step = jax.jit(train_step, donate_argnums=0)
        self.eval_step = jax.jit(eval_step)

    def _group_sampler(self):
        """Aspect-ratio grouped sampler (models/init_model.py:98-125),
        built once per batch size — the ratio groups are constant for the
        whole run."""
        if not self.cfg.resolution_buckets \
                and self.cfg.aspect_ratio_group_factor < 0:
            return None
        cached = getattr(self, "_sampler_cache", None)
        if cached is not None and cached[0] == self.batch_size:
            return cached[1]
        from instancesegmentation_tpu.data.aspect_ratio import (
            BucketBatchSampler, GroupedBatchSampler,
            create_aspect_ratio_groups)
        if self.cfg.resolution_buckets:
            sampler = BucketBatchSampler(self.train_ds,
                                         self.cfg.resolution_buckets,
                                         self.batch_size, seed=self.cfg.seed)
        else:
            groups = create_aspect_ratio_groups(
                self.train_ds, self.cfg.aspect_ratio_group_factor)
            sampler = GroupedBatchSampler(groups, self.batch_size,
                                          seed=self.cfg.seed)
        self._sampler_cache = (self.batch_size, sampler)
        return sampler

    def _loaders(self):
        # per-process input sharding (the DistributedSampler analogue):
        # every process computes the same global batch composition but
        # decodes only its contiguous slice; shard_batch reassembles.
        # Single-process (the common case) this is a no-op.
        shard = dict(num_shards=jax.process_count(),
                     shard_index=jax.process_index())
        train = Loader(self.train_ds, self.batch_size, self.collate,
                       shuffle=True, seed=self.cfg.seed,
                       num_workers=self.cfg.num_workers,
                       batch_sampler=self._group_sampler(), **shard)
        val = Loader(self.val_ds, self.batch_size, self.collate,
                     shuffle=False, seed=self.cfg.seed,
                     num_workers=self.cfg.num_workers, **shard)
        if len(train) == 0 or len(val) == 0:
            raise ValueError("dataset too small for the batch size "
                             "(reference trainer.py:95-96)")
        return train, val

    def _switch_to_unfreeze(self):
        """Freeze -> unfreeze (reference trainer.py:172-207)."""
        cfg = self.cfg
        log.info("phase switch: unfreezing backbone")
        self.frozen = False
        self.batch_size = self._fit_batch(cfg.unfreeze_batch_size)
        init_fit, min_fit = schedules.scale_lr_unfreeze(
            self.batch_size, cfg.init_lr, cfg.min_lr, cfg.optimizer_type)
        self.lr_func = schedules.get_lr_scheduler(
            cfg.lr_decay_type, init_fit, min_fit, cfg.unfreeze_epoch)
        self.tx = make_phase_optimizer(cfg, init_fit, False, self.state.params)
        # fresh optimizer state, same params/stats/EMA (reference builds a
        # brand-new optimizer at the switch)
        self.state = TrainState(step=self.state.step, params=self.state.params,
                                batch_stats=self.state.batch_stats,
                                opt_state=self.tx.init(self.state.params),
                                ema_params=self.state.ema_params)
        self._build_steps()
        self.history.reset_stop()

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        rng = jax.random.key(cfg.seed + 1)
        result: Dict[str, float] = {}

        for epoch in range(self.start_epoch, cfg.unfreeze_epoch):
            if self.frozen and epoch >= cfg.freeze_epoch:
                self._switch_to_unfreeze()
            if (not self.frozen) and cfg.early_stopping and self.history.stopping:
                log.info("early stopping at epoch %d", epoch)
                break

            lr = self.lr_func(epoch)
            from instancesegmentation_tpu.train.state import set_learning_rate
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, lr))

            train_loader, val_loader = self._loaders()
            t0 = time.time()
            tr_loss = self._run_train_epoch(train_loader, epoch, rng, lr)
            va_loss = self._run_val_epoch(val_loader, epoch, rng)
            dt = time.time() - t0

            self.history.epoch_loss(tr_loss, va_loss, epoch)
            best = self.history.best_val
            is_best = best is not None and va_loss <= best
            # best is tracked EVERY epoch (models/script.py:140-142) as a
            # cheap in-memory snapshot; disk writes are throttled to
            # save_period (a full-state write costs seconds)
            if is_best:
                self._best_state = jax.tree_util.tree_map(jnp_copy, self.state)
                self._best_epoch = epoch
                self._best_dirty = True
            if (epoch + 1) % cfg.save_period == 0 or epoch + 1 == cfg.unfreeze_epoch:
                if getattr(self, "_best_dirty", False):
                    self.ckpt.save("best_epoch_weights", self._best_state,
                                   meta={"epoch": self._best_epoch,
                                         "frozen": self.frozen})
                    self._best_dirty = False
                self.ckpt.save_epoch(epoch, self.state, tr_loss, va_loss,
                                     is_best=False,
                                     keep_epoch_files=cfg.keep_epoch_checkpoints,
                                     meta={"frozen": self.frozen})
            log.info("epoch %d/%d  lr %.2e  train %.4f  val %.4f  (%.1fs)",
                     epoch + 1, cfg.unfreeze_epoch, lr, tr_loss, va_loss, dt)
            result = {"epoch": epoch, "train_loss": tr_loss, "val_loss": va_loss}

        if getattr(self, "_best_dirty", False):
            self.ckpt.save("best_epoch_weights", self._best_state,
                           meta={"epoch": self._best_epoch,
                                 "frozen": self.frozen})
            self._best_dirty = False
        self.ckpt.wait()
        return result

    def _feed(self, batch):
        """One place for the feed-path policy (train AND val loops).

        Default: async staged H2D — `shard_batch` starts the (sharded)
        transfer immediately, overlapping the in-flight step's compute.
        On the single-chip axon relay the staged buffer stays host-backed
        (no overlap to win, one extra relay RPC per batch), so host numpy
        is fed straight to jit instead (utils/device.py:host_feed_only)."""
        clean = {k: v for k, v in batch.items() if k != "image_id"}
        if self.mesh.size == 1 and host_feed_only():
            return clean
        return shard_batch(clean, self.mesh)

    def _run_train_epoch(self, loader, epoch, rng, lr) -> float:
        total, n = 0.0, 0
        step0 = int(self.state.step)
        pending = None   # one-step-delayed host sync keeps the pipe full

        def drain(metrics, step_id):
            nonlocal total, n
            loss = float(metrics["total"])
            if not np.isfinite(loss):
                # reference aborts on non-finite loss (models/script.py:205-208)
                raise FloatingPointError(
                    f"non-finite loss at step {step_id}: "
                    f"{jax.tree_util.tree_map(float, metrics)}")
            total += loss
            n += 1
            self.history.step(loss, lr, step_id)

        it = iter(loader.epoch(epoch))
        nxt = next(it, None)
        staged = self._feed(nxt) if nxt is not None else None
        i = 0
        while staged is not None:
            if self.max_steps_per_epoch and i >= self.max_steps_per_epoch:
                break
            cur = staged
            nxt = next(it, None)
            staged = self._feed(nxt) if nxt is not None else None
            # the step folds state.step into the base key ON DEVICE
            self.state, metrics = self.train_step(self.state, cur, rng)
            if pending is not None:
                drain(*pending)
            pending = (metrics, step0 + i + 1)
            i += 1
        if pending is not None:
            drain(*pending)
        return total / max(n, 1)

    def _run_val_epoch(self, loader, epoch, rng) -> float:
        total, n = 0.0, 0
        eval_rng = jax.random.fold_in(rng, 0xE7A1)
        for i, batch in enumerate(loader.epoch(0)):
            if self.max_steps_per_epoch and i >= self.max_steps_per_epoch:
                break
            losses = self.eval_step(self.state, self._feed(batch), eval_rng)
            loss = float(losses["total"])
            if not np.isfinite(loss):
                # the reference only guards the train loop; an unguarded
                # NaN val loss silently corrupts best-checkpoint tracking
                # (min over a list containing NaN)
                raise FloatingPointError(
                    f"non-finite VAL loss at epoch {epoch} batch {i}: "
                    f"{jax.tree_util.tree_map(float, losses)}")
            total += loss
            n += 1
        return total / max(n, 1)


def _init_logging(out_dir: str):
    """rank-0 file+stdout logging (utils/tools.py:5-16)."""
    if log.handlers:
        return
    log.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    for h in (logging.StreamHandler(),
              logging.FileHandler(os.path.join(out_dir, "training.log"))):
        h.setFormatter(fmt)
        log.addHandler(h)
