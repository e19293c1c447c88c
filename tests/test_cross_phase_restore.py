"""Regression (review finding): checkpoints saved in the FREEZE phase
(multi_transform opt_state) must load in predictors/eval and in a resume
whose template is the other phase."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def freeze_ckpt(tmp_path_factory):
    """Save a freeze-phase train state (multi_transform optimizer)."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.checkpoints import CheckpointIO
    from instancesegmentation_tpu.train.state import create_train_state

    cfg = get_config("yolact_synth", input_shape=(96, 96),
                     mixed_precision=False, ema=True)
    model = get_model(cfg, train_mode=True)
    sample = np.zeros((1, 96, 96, 3), np.float32)
    state = create_train_state(model, cfg, jax.random.key(0), sample,
                               lr=1e-3, frozen_backbone=True)
    d = tmp_path_factory.mktemp("ckpt")
    io = CheckpointIO(str(d))
    io.save("best_epoch_weights", state)
    io.wait()
    return cfg, str(d)


def test_inference_load_from_freeze_phase(freeze_ckpt):
    """load_inference_variables must not need a phase-matched template."""
    import os
    from instancesegmentation_tpu.train.checkpoints import \
        load_inference_variables
    cfg, d = freeze_ckpt
    variables = load_inference_variables(os.path.join(d, "best_epoch_weights"))
    assert "params" in variables and "batch_stats" in variables
    # EMA weights preferred when present
    assert "backbone" in variables["params"]


def test_predictor_from_freeze_phase_checkpoint(freeze_ckpt):
    import os
    from instancesegmentation_tpu.models.yolact.predictor import YolactPredictor
    cfg, d = freeze_ckpt
    pred = YolactPredictor(cfg, checkpoint=os.path.join(d, "best_epoch_weights"))
    img = np.random.RandomState(0).randint(0, 255, (64, 80, 3)).astype(np.uint8)
    det = pred.raw_detect(img)
    assert det["masks_arg"].shape == (64, 80)


def test_resume_across_phase(freeze_ckpt, tmp_path):
    """Trainer built for the UNFREEZE phase resumes a freeze-phase save."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.train.trainer import Trainer
    cfg, d = freeze_ckpt
    cfg2 = cfg.replace(freeze_train=False, data_root=str(tmp_path / "synth"),
                       out_root=str(tmp_path / "out"),
                       freeze_batch_size=8, unfreeze_batch_size=8,
                       num_workers=1)
    import os
    import shutil
    ckdir = os.path.join(cfg2.out_root, cfg2.name, "ckpt")
    os.makedirs(os.path.dirname(ckdir), exist_ok=True)
    shutil.copytree(d, ckdir)
    os.rename(os.path.join(ckdir, "best_epoch_weights"),
              os.path.join(ckdir, "last_epoch_weights"))
    tr = Trainer(cfg2, resume=True)          # must not raise
    assert int(tr.state.step) == 0

    # resume epoch comes from the sidecar meta, not step//steps_per_epoch
    # (which miscounts when the phase switch changed the batch size)
    from instancesegmentation_tpu.train.checkpoints import CheckpointIO
    io = CheckpointIO(ckdir)
    io.save("last_epoch_weights", tr.state, meta={"epoch": 37, "frozen": False})
    io.wait()
    tr2 = Trainer(cfg2, resume=True)
    assert tr2.start_epoch == 38


def test_resume_preserves_unfreeze_opt_state(freeze_ckpt, tmp_path):
    """A checkpoint saved in the UNFREEZE phase resumed by a trainer that
    initializes in the freeze phase must carry the adam moments through
    the init-time phase switch — the epoch-loop switch used to
    tx.init-reset them (observed: one-step loss spike 0.018 -> 3.6 on a
    memorization run resumed at epoch 500)."""
    import os
    import jax.numpy as jnp
    from instancesegmentation_tpu.train.checkpoints import CheckpointIO
    from instancesegmentation_tpu.train.trainer import Trainer
    cfg, d = freeze_ckpt
    cfg2 = cfg.replace(freeze_train=True, freeze_epoch=1, unfreeze_epoch=10,
                       data_root=str(tmp_path / "synth"),
                       out_root=str(tmp_path / "out"),
                       freeze_batch_size=8, unfreeze_batch_size=8,
                       num_workers=1)
    tr = Trainer(cfg2)                      # builds the ckpt dir layout
    assert tr.frozen

    # forge an unfreeze-phase checkpoint whose moments are all ones —
    # distinguishable from both a fresh tx.init (zeros) and the params
    marked = tr.state.replace(opt_state=jax.tree_util.tree_map(
        jnp.ones_like, tr.state.opt_state))
    ckdir = os.path.join(cfg2.out_root, cfg2.name, "ckpt")
    io = CheckpointIO(ckdir)
    io.save("last_epoch_weights", marked, meta={"epoch": 5, "frozen": False})
    io.wait()

    tr2 = Trainer(cfg2, resume=True)
    assert tr2.start_epoch == 6
    assert not tr2.frozen                   # switched at init, not in train()
    leaves = jax.tree_util.tree_leaves(tr2.state.opt_state)
    assert leaves and all(bool(jnp.all(l == 1)) for l in leaves)


def test_val_nan_aborts(freeze_ckpt, tmp_path):
    """A non-finite VAL loss must abort instead of silently polluting the
    best-checkpoint tracking (reference guards only the train loop)."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.train.trainer import Trainer
    cfg, _ = freeze_ckpt
    cfg2 = cfg.replace(data_root=str(tmp_path / "synth"),
                       out_root=str(tmp_path / "out"),
                       freeze_batch_size=8, unfreeze_batch_size=8,
                       num_workers=1, unfreeze_epoch=1, freeze_epoch=1)
    tr = Trainer(cfg2, max_steps_per_epoch=1)
    real_eval = tr.eval_step
    import jax.numpy as jnp

    def nan_eval(state, batch, rng):
        out = real_eval(state, batch, rng)
        return {k: v * jnp.nan for k, v in out.items()}
    tr.eval_step = nan_eval
    with pytest.raises(FloatingPointError, match="VAL"):
        tr.train()
