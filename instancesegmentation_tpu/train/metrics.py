"""Observability: loss history, TensorBoard scalars, early stopping.

Port of the reference's LossHistory (utils/helpers.py:185-240): the same
scalar names including the Freeze_/UnFreeze_ prefixes, per-step and
per-epoch records, and the patience-10 early-stop counter that resets at
the freeze->unfreeze switch. TensorBoard output uses tf.summary when
tensorflow is importable; a JSONL mirror is always written so runs are
inspectable without TB.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            import tensorflow as tf  # optional
            self._tb = tf.summary.create_file_writer(
                os.path.join(log_dir, "tensorboard"))
        except Exception:
            self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "time": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.scalar(tag, value, step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class LossHistory:
    """Step/epoch loss records + early stopping (utils/helpers.py:185-240)."""

    def __init__(self, writer: Optional[MetricWriter], freeze_flag: bool,
                 patience: int = 10):
        self.writer = writer
        self.freeze_flag = freeze_flag      # True during the freeze phase
        self.patience = patience
        self.stopping = False
        self._best: Optional[float] = None
        self._counter = 0
        self.train_losses = []
        self.val_losses = []

    @property
    def _prefix(self) -> str:
        return "Freeze_" if self.freeze_flag else "UnFreeze_"

    def step(self, loss: float, lr: float, global_step: int):
        if self.writer:
            self.writer.scalar(self._prefix + "step/Train/Loss", loss, global_step)
            self.writer.scalar(self._prefix + "step/Train/lr", lr, global_step)

    def epoch_loss(self, train_loss: float, val_loss: float, epoch: int):
        self.train_losses.append(train_loss)
        self.val_losses.append(val_loss)
        if self.writer:
            self.writer.scalar(self._prefix + "epoch/Loss/Train", train_loss, epoch)
            self.writer.scalar(self._prefix + "epoch/Loss/Val", val_loss, epoch)
        self.decide(val_loss)

    def decide(self, val_loss: float):
        """Patience counter on epoch val loss (utils/helpers.py:230-240)."""
        if self._best is None or val_loss < self._best:
            self._best = val_loss
            self._counter = 0
        else:
            self._counter += 1
            if self._counter >= self.patience:
                self.stopping = True

    def reset_stop(self):
        """Phase switch: reset the counter (trainer.py:177, helpers reset)."""
        self.freeze_flag = False
        self._best = None
        self._counter = 0
        self.stopping = False

    @property
    def best_val(self) -> Optional[float]:
        return min(self.val_losses) if self.val_losses else None
