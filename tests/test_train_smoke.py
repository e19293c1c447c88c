"""End-to-end smoke: YOLACT train/eval steps on the synthetic set (CPU,
8 virtual devices — exercises the sharded data-parallel path that replaces
DDP, per SURVEY §4(d))."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    from instancesegmentation_tpu.config import get_config
    root = tmp_path_factory.mktemp("synth_train")
    return get_config(
        "yolact_synth", data_root=str(root),
        out_root=str(tmp_path_factory.mktemp("out")),
        input_shape=(128, 128), freeze_batch_size=8, unfreeze_batch_size=8,
        num_workers=1,
        # bf16 is pathologically slow to COMPILE on the CPU backend
        # (~8x on init); tests run f32, bench covers bf16 on TPU
        mixed_precision=False)


def test_trainer_two_phase_smoke(cfg):
    """One freeze epoch + one unfreeze epoch, loss finite and recorded;
    checkpoints written; runs sharded over 8 virtual devices."""
    import jax
    from instancesegmentation_tpu.train.trainer import Trainer

    assert len(jax.devices()) == 8
    tr = Trainer(cfg, max_steps_per_epoch=2)
    assert tr.n_devices == 8
    result = tr.train()
    assert np.isfinite(result["train_loss"])
    assert np.isfinite(result["val_loss"])
    assert result["epoch"] == cfg.unfreeze_epoch - 1
    assert not tr.frozen                       # phase switch happened
    assert tr.ckpt.has("best_epoch_weights")
    assert tr.ckpt.has("last_epoch_weights")
    # loss history recorded both epochs
    assert len(tr.history.train_losses) == cfg.unfreeze_epoch


def test_train_loss_decreases_overfit(cfg):
    """Optimization sanity: loss drops when overfitting a few batches."""
    from instancesegmentation_tpu.train.trainer import Trainer

    c = cfg.replace(name="overfit", freeze_train=False,
                    unfreeze_epoch=1, freeze_epoch=0, init_lr=1e-3)
    tr = Trainer(c, max_steps_per_epoch=14)
    losses = []
    loader, _ = tr._loaders()
    import jax
    from instancesegmentation_tpu.parallel import shard_batch
    rng = jax.random.key(0)
    batch = next(iter(loader.epoch(0)))
    db = shard_batch({k: v for k, v in batch.items() if k != "image_id"},
                     tr.mesh)
    for i in range(12):
        tr.state, metrics = tr.train_step(tr.state, db,
                                          jax.random.fold_in(rng, i))
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.9, losses


def test_trainer_bucketed_mask_rcnn_smoke(tmp_path_factory):
    """Resolution-bucketed Mask R-CNN training end-to-end: aspect-varied
    synthetic data, BucketBatchSampler active with >=2 distinct bucket
    shapes in an epoch, keep-aspect val transform, finite losses (the
    static-shape analogue of the reference's min800/max1333 packing)."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.train.trainer import Trainer

    cfg = get_config(
        "mask_rcnn_synth_buckets",
        data_root=str(tmp_path_factory.mktemp("synth_ar")),
        out_root=str(tmp_path_factory.mktemp("out")),
        input_shape=(96, 96),
        resolution_buckets=((96, 96), (80, 112), (112, 80)),
        freeze_batch_size=8, unfreeze_batch_size=8,
        num_workers=1, mixed_precision=False,
        unfreeze_epoch=1, freeze_epoch=0, freeze_train=False)
    tr = Trainer(cfg, max_steps_per_epoch=4)
    # the sampler groups by bucket and tags each batch with its (H, W)
    sampler = tr._group_sampler()
    hw_seen = {hw for hw, _ in sampler.epoch(0)}
    assert len(hw_seen) >= 2, hw_seen
    assert hw_seen <= set(cfg.resolution_buckets)
    # val transform preserves aspect (matches training geometry)
    assert tr.val_ds.transform.keep_aspect
    result = tr.train()
    assert np.isfinite(result["train_loss"])
    assert np.isfinite(result["val_loss"])


def test_trainer_freeze_phase_bn_stats(tmp_path_factory):
    """cfg.freeze_phase_bn_stats: backbone BN statistics stay EXACTLY
    fixed through the freeze phase and move again once the unfreeze
    switch rebuilds the step with live BN (the opt-in deviation
    documented in config.py)."""
    import jax
    import numpy as np
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.train.trainer import Trainer

    def run(tag, **over):
        cfg = get_config(
            "yolact_synth",
            data_root=str(tmp_path_factory.mktemp(f"synth_{tag}")),
            out_root=str(tmp_path_factory.mktemp(f"out_{tag}")),
            input_shape=(128, 128), freeze_batch_size=8,
            unfreeze_batch_size=8, num_workers=1, mixed_precision=False,
            freeze_phase_bn_stats=True, **over)
        tr = Trainer(cfg, max_steps_per_epoch=2)
        stats0 = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(tr.state.batch_stats)]
        result = tr.train()
        assert np.isfinite(result["train_loss"])
        stats1 = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(tr.state.batch_stats)]
        return tr, stats0, stats1

    # freeze-only run (switch never happens): stats bit-identical
    tr, s0, s1 = run("frz", freeze_epoch=2, unfreeze_epoch=2)
    assert tr.frozen
    assert all(np.array_equal(a, b) for a, b in zip(s0, s1))

    # freeze + unfreeze run: the live-BN unfreeze epoch moves the stats
    tr, s0, s1 = run("both", freeze_epoch=1, unfreeze_epoch=2)
    assert not tr.frozen
    assert any(not np.allclose(a, b) for a, b in zip(s0, s1))
