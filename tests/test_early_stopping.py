"""Behavioral early-stopping tests.

The reference's headline feature (README.md:5): LossHistory keeps a
patience counter on epoch val loss (utils/helpers.py:230-240), the counter
resets at the freeze->unfreeze switch, and the trainer honors the stop flag
ONLY in the unfreeze phase (trainer.py:210). These tests drive the real
Trainer orchestration (trainer.py epoch loop, phase switch, stop gate)
with rigged val-loss sequences so every path is exercised without real
optimization work.
"""

import numpy as np
import pytest


def test_loss_history_decide_semantics():
    from instancesegmentation_tpu.train.metrics import LossHistory

    h = LossHistory(None, freeze_flag=True, patience=3)
    h.decide(1.0)                       # first value becomes best
    assert h._counter == 0 and not h.stopping
    h.decide(1.0)                       # equal is NOT an improvement
    h.decide(1.2)
    assert h._counter == 2 and not h.stopping
    h.decide(0.9)                       # improvement resets the counter
    assert h._counter == 0
    h.decide(0.9); h.decide(0.95); h.decide(1.0)
    assert h._counter == 3 and h.stopping

    # phase switch re-arms: counter, best, and the flag all clear
    h.reset_stop()
    assert not h.stopping and h._counter == 0 and h._best is None
    assert not h.freeze_flag            # prefix flips to UnFreeze_
    h.decide(5.0)                       # post-switch best starts fresh
    assert h._counter == 0 and not h.stopping


@pytest.fixture(scope="module")
def trainer_factory(tmp_path_factory):
    """Builds a tiny real Trainer whose per-epoch train/val work is
    replaced by rigged loss sequences — the orchestration (phase switch,
    LR set, loaders, stop gate) still runs for real."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.train.trainer import Trainer

    data_root = str(tmp_path_factory.mktemp("synth_es"))

    def build(val_losses, **over):
        over.setdefault("early_stopping", True)
        cfg = get_config(
            "yolact_synth", data_root=data_root,
            out_root=str(tmp_path_factory.mktemp("out_es")),
            input_shape=(64, 64), freeze_batch_size=8, unfreeze_batch_size=8,
            num_workers=1, mixed_precision=False, save_period=1000, **over)
        tr = Trainer(cfg, max_steps_per_epoch=1)
        vals = iter(val_losses)
        epochs_run = []
        tr._run_train_epoch = lambda loader, epoch, rng, lr: (
            epochs_run.append(epoch) or 0.3)
        tr._run_val_epoch = lambda loader, epoch, rng: next(vals)
        return tr, epochs_run

    return build


def test_early_stop_fires_in_unfreeze_phase_only(trainer_factory):
    """Flat val loss from epoch 0: the counter exceeds patience DURING the
    freeze phase but the trainer must not stop there (trainer.py:210 gate);
    the switch resets the counter; patience flat unfreeze epochs then stop
    the run."""
    # freeze epochs 0-3: vals never improve after the first -> counter 3
    # >= patience 2 inside the freeze phase
    # unfreeze epochs 4+: one improvement then flat -> stop after 2
    vals = [0.5, 1.0, 1.0, 1.0,          # freeze (stopping set, ignored)
            0.4, 0.9, 0.9,               # unfreeze: best, then 2 flat
            0.1, 0.1, 0.1, 0.1]          # never reached
    tr, epochs_run = trainer_factory(
        vals, freeze_epoch=4, unfreeze_epoch=20, patience=2)

    assert tr.history.stopping is False
    result = tr.train()

    # freeze phase ran to completion despite the tripped counter
    assert epochs_run[:4] == [0, 1, 2, 3]
    # the switch reset the counter (else epoch 4 would never have run)
    assert not tr.frozen
    # stopped after exactly patience=2 flat unfreeze epochs: epochs 4,5,6
    # ran, epoch 7 hit the gate and broke
    assert epochs_run == [0, 1, 2, 3, 4, 5, 6]
    assert result["epoch"] == 6
    assert tr.history.stopping is True


def test_no_early_stop_when_disabled(trainer_factory):
    """cfg.early_stopping=False: the same flat sequence runs every epoch
    (the reference honors opt.Early_Stopping the same way, trainer.py:210)."""
    vals = [1.0] * 8
    tr, epochs_run = trainer_factory(
        vals, freeze_epoch=2, unfreeze_epoch=8, patience=2,
        early_stopping=False)
    tr.train()
    assert epochs_run == list(range(8))
    # the counter still tripped — only the gate ignored it
    assert tr.history.stopping is True


def test_improving_val_never_stops(trainer_factory):
    """Monotonically improving val loss: counter never accumulates."""
    vals = [1.0 - 0.05 * i for i in range(10)]
    tr, epochs_run = trainer_factory(
        vals, freeze_epoch=2, unfreeze_epoch=10, patience=2)
    tr.train()
    assert epochs_run == list(range(10))
    assert tr.history.stopping is False
