"""LR schedule parity: exact values of the reference formulas
(utils/helpers.py:153-183, trainer.py:82-84 + :185-189)."""

import math

import pytest

from instancesegmentation_tpu.train import schedules


def test_warm_cos_schedule_values():
    lr, min_lr, total = 1e-3, 1e-5, 100
    f = schedules.get_lr_scheduler("cos", lr, min_lr, total)
    # warmup_total_iters = min(max(.05*100,1),3) = 3; start = max(.1*lr,1e-6)
    warmup_start = 0.1 * lr
    assert f(0) == pytest.approx(warmup_start)
    assert f(3) == pytest.approx(lr)                  # end of quadratic warmup
    # quadratic shape at iter 1: (lr-ws)*(1/3)^2 + ws
    assert f(1) == pytest.approx((lr - warmup_start) * (1 / 3) ** 2 + warmup_start)
    # no_aug tail: min(max(.05*100,1),15) = 5 -> iters >= 95 give min_lr
    assert f(95) == min_lr and f(99) == min_lr
    # cosine midpoint between 3 and 95
    mid = (3 + 95) / 2
    expect = min_lr + 0.5 * (lr - min_lr) * (1 + math.cos(
        math.pi * (mid - 3) / (100 - 3 - 5)))
    assert f(int(mid)) == pytest.approx(
        min_lr + 0.5 * (lr - min_lr) * (1 + math.cos(
            math.pi * (int(mid) - 3) / (100 - 3 - 5))))
    assert expect > min_lr


def test_step_schedule_values():
    lr, min_lr, total = 1e-2, 1e-4, 100
    f = schedules.get_lr_scheduler("step", lr, min_lr, total, step_num=10)
    decay = (min_lr / lr) ** (1 / 9)
    step_size = total / 10
    assert f(0) == pytest.approx(lr)
    assert f(int(step_size)) == pytest.approx(lr * decay)
    assert f(99) == pytest.approx(lr * decay ** 9)


def test_scale_lr_freeze():
    # nbs=64, floor-only (trainer.py:82-84)
    init, mn = schedules.scale_lr_freeze(14, 1e-4, 1e-6)
    assert init == pytest.approx(max(14 / 64 * 1e-4, 1e-4))
    assert mn == pytest.approx(max(14 / 64 * 1e-6, 1e-6))
    init, mn = schedules.scale_lr_freeze(640, 1e-4, 1e-6)
    assert init == pytest.approx(1e-3)


def test_scale_lr_unfreeze_clamps():
    # adam clamp 1e-4 / 3e-5 (trainer.py:185-189)
    init, mn = schedules.scale_lr_unfreeze(8, 1e-4, 1e-6, "adam")
    assert init == pytest.approx(min(max(8 / 16 * 1e-4, 3e-5), 1e-4))
    assert mn == pytest.approx(min(max(8 / 16 * 1e-6, 3e-7), 1e-6))
    # sgd clamp 5e-2 / 5e-4
    init, _ = schedules.scale_lr_unfreeze(2, 5e-3, 5e-5, "sgd")
    assert init == pytest.approx(min(max(2 / 16 * 5e-3, 5e-4), 5e-2))
