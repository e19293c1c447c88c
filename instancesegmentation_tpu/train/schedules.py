"""LR schedules + linear batch-size scaling — exact ports of the
reference's host-side schedule math.

* ``yolox_warm_cos`` / ``step_lr`` — utils/helpers.py:153-183 (identical to
  inst_model/yolact/nets/yolact_training.py:366-396): quadratic warmup
  (<=3 epochs), cosine body, min-lr tail (<=15 epochs); or exponential
  step decay. Epoch-indexed, evaluated on host — the resulting scalar is
  fed into the jitted step (no recompiles).
* ``scale_lr`` — the nbs linear scaling rule (trainer.py:82-84 freeze
  nbs=64, :185-189 unfreeze nbs=16).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable


def get_lr_scheduler(lr_decay_type: str, lr: float, min_lr: float,
                     total_iters: int, warmup_iters_ratio: float = 0.05,
                     warmup_lr_ratio: float = 0.1,
                     no_aug_iter_ratio: float = 0.05,
                     step_num: int = 10) -> Callable[[int], float]:
    def yolox_warm_cos_lr(lr, min_lr, total_iters, warmup_total_iters,
                          warmup_lr_start, no_aug_iter, iters):
        if iters <= warmup_total_iters:
            return ((lr - warmup_lr_start)
                    * pow(iters / float(warmup_total_iters), 2)
                    + warmup_lr_start)
        if iters >= total_iters - no_aug_iter:
            return min_lr
        return min_lr + 0.5 * (lr - min_lr) * (
            1.0 + math.cos(math.pi * (iters - warmup_total_iters)
                           / (total_iters - warmup_total_iters - no_aug_iter)))

    def step_lr(lr, decay_rate, step_size, iters):
        if step_size < 1:
            raise ValueError("step_size must be above 1.")
        return lr * decay_rate ** (iters // step_size)

    if lr_decay_type == "cos":
        warmup_total_iters = min(max(warmup_iters_ratio * total_iters, 1), 3)
        warmup_lr_start = max(warmup_lr_ratio * lr, 1e-6)
        no_aug_iter = min(max(no_aug_iter_ratio * total_iters, 1), 15)
        return partial(yolox_warm_cos_lr, lr, min_lr, total_iters,
                       warmup_total_iters, warmup_lr_start, no_aug_iter)
    decay_rate = (min_lr / lr) ** (1 / (step_num - 1))
    step_size = total_iters / step_num
    return partial(step_lr, lr, decay_rate, step_size)


def scale_lr_freeze(batch_size: int, init_lr: float, min_lr: float):
    """Freeze-phase linear scaling, nbs=64, floor-only clamps
    (trainer.py:82-84)."""
    nbs = 64.0
    return (max(batch_size / nbs * init_lr, 1e-4),
            max(batch_size / nbs * min_lr, 1e-6))


def scale_lr_unfreeze(batch_size: int, init_lr: float, min_lr: float,
                      optimizer_type: str):
    """Unfreeze-phase scaling, nbs=16, per-optimizer clamps
    (trainer.py:185-189)."""
    nbs = 16.0
    if optimizer_type in ("adam", "adamw"):
        lr_limit_max, lr_limit_min = 1e-4, 3e-5
    else:
        lr_limit_max, lr_limit_min = 5e-2, 5e-4
    init_fit = min(max(batch_size / nbs * init_lr, lr_limit_min), lr_limit_max)
    min_fit = min(max(batch_size / nbs * min_lr, lr_limit_min * 1e-2),
                  lr_limit_max * 1e-2)
    return init_fit, min_fit
