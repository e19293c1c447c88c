"""FusedTx numerical parity vs the optax chain it replaces.

The fused single-pass optimizer+EMA (train/state.py:FusedTx) must produce
the SAME trajectory as inject_hyperparams(chain(add_decayed_weights,
adam/adamw/sgd)) [+ multi_transform freeze] + apply_updates + ema_update —
per-step bitwise-close params, moments, and EMA, across an LR change and
a mid-run freeze-label configuration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from instancesegmentation_tpu.train.state import (FusedTx, ema_update,
                                                  get_learning_rate,
                                                  make_optimizer,
                                                  make_phase_optimizer,
                                                  set_learning_rate)

EMA_DECAY, EMA_TAU = 0.9999, 2000.0


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "backbone": {"conv1": {"kernel": jnp.asarray(
            rs.randn(3, 3, 4, 8), jnp.float32)},
            "bn1": {"scale": jnp.asarray(rs.rand(8), jnp.float32),
                    "bias": jnp.asarray(rs.randn(8), jnp.float32)}},
        "head": {"dense": {"kernel": jnp.asarray(rs.randn(8, 5),
                                                 jnp.float32),
                           "bias": jnp.zeros((5,), jnp.float32)}},
    }


def _grads(params, seed):
    rs = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rs.randn(*p.shape) * 1e-2, p.dtype), params)


def _run_optax(kind, momentum, wd, lr, params, n_steps, labels=None,
               lr_switch=None, ema0=None):
    inner = make_optimizer(kind, momentum, wd, lr)
    tx = inner if labels is None else optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, labels)
    opt = tx.init(params)
    ema = ema0
    step = jnp.zeros((), jnp.int32)
    for i in range(n_steps):
        if lr_switch is not None and i == lr_switch[0]:
            opt = set_learning_rate(opt, lr_switch[1])
        g = _grads(params, 100 + i)
        updates, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, updates)
        step = step + 1
        if ema is not None:
            ema = ema_update(ema, params, step, EMA_DECAY, EMA_TAU)
    return params, ema, opt


def _run_fused(kind, momentum, wd, lr, params, n_steps, labels=None,
               lr_switch=None, ema0=None):
    tx = FusedTx(kind, momentum, wd, lr, labels=labels)
    opt = tx.init(params)
    ema = ema0
    step = jnp.zeros((), jnp.int32)
    for i in range(n_steps):
        if lr_switch is not None and i == lr_switch[0]:
            opt = set_learning_rate(opt, lr_switch[1])
        g = _grads(params, 100 + i)
        step = step + 1
        params, opt, ema = tx.apply_fused(g, opt, params, ema, step,
                                          EMA_DECAY, EMA_TAU)
    return params, ema, opt


def _assert_close(a, b, atol=1e-6):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=1e-5)


@pytest.mark.parametrize("kind,momentum,wd", [
    ("adam", 0.9, 5e-4), ("adam", 0.937, 0.0),
    ("adamw", 0.9, 5e-4), ("sgd", 0.937, 5e-4),
])
def test_parity_plain(kind, momentum, wd):
    params = _tree()
    ema0 = jax.tree_util.tree_map(jnp.copy, params)
    p_ref, e_ref, _ = _run_optax(kind, momentum, wd, 1e-2, params, 5,
                                 ema0=ema0)
    p_fus, e_fus, _ = _run_fused(kind, momentum, wd, 1e-2, params, 5,
                                 ema0=ema0)
    _assert_close(p_ref, p_fus)
    _assert_close(e_ref, e_fus)


def test_parity_lr_switch_and_get():
    params = _tree()
    p_ref, _, _ = _run_optax("adam", 0.9, 5e-4, 1e-2, params, 6,
                             lr_switch=(3, 1e-3))
    p_fus, _, opt = _run_fused("adam", 0.9, 5e-4, 1e-2, params, 6,
                               lr_switch=(3, 1e-3))
    _assert_close(p_ref, p_fus)
    assert get_learning_rate(opt) == pytest.approx(1e-3)


def test_parity_frozen_labels():
    params = _tree()
    labels = {
        "backbone": {"conv1": {"kernel": "frozen"},
                     "bn1": {"scale": "frozen", "bias": "frozen"}},
        "head": {"dense": {"kernel": "train", "bias": "train"}},
    }
    ema0 = jax.tree_util.tree_map(jnp.copy, params)
    p_ref, e_ref, _ = _run_optax("adam", 0.9, 5e-4, 1e-2, params, 5,
                                 labels=labels, ema0=ema0)
    p_fus, e_fus, _ = _run_fused("adam", 0.9, 5e-4, 1e-2, params, 5,
                                 labels=labels, ema0=ema0)
    _assert_close(p_ref, p_fus)
    _assert_close(e_ref, e_fus)
    # frozen leaves really did not move
    np.testing.assert_array_equal(
        np.asarray(p_fus["backbone"]["conv1"]["kernel"]),
        np.asarray(params["backbone"]["conv1"]["kernel"]))


def test_phase_optimizer_returns_fused_and_escape_hatch(monkeypatch):
    @dataclasses.dataclass(frozen=True)
    class _Cfg:
        optimizer_type: str = "adam"
        momentum: float = 0.9
        weight_decay: float = 5e-4
        net: str = "yolact"
        trainable_layers: int = 3
        frozen_bn: bool = False

    params = {"backbone": {"conv1": {"kernel": jnp.ones((2, 2))}},
              "head": {"dense": {"kernel": jnp.ones((2, 2))}}}
    tx = make_phase_optimizer(_Cfg(), 1e-3, False, params)
    assert isinstance(tx, FusedTx)
    monkeypatch.setenv("INSTSEG_FUSED_OPT", "0")
    tx = make_phase_optimizer(_Cfg(), 1e-3, False, params)
    assert not isinstance(tx, FusedTx)


def test_fused_state_checkpoint_roundtrip(tmp_path):
    """FusedOptState survives the orbax save/restore used by the trainer."""
    from instancesegmentation_tpu.train.checkpoints import CheckpointIO
    from instancesegmentation_tpu.train.state import TrainState

    params = _tree()
    tx = FusedTx("adam", 0.9, 5e-4, 1e-2)
    state = TrainState(step=jnp.ones((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params),
                       ema_params=None)
    io = CheckpointIO(str(tmp_path))
    io.save("w", state)
    restored = io.restore("w", state)
    _assert_close(restored.opt_state.mu, state.opt_state.mu)
    assert int(restored.opt_state.count) == 0
    assert get_learning_rate(restored.opt_state) == pytest.approx(1e-2)
