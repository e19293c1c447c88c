"""The stop_gradient freeze guard (train/steps.py:_freeze_guard) must be
numerically invisible: it prunes the frozen backward from the graph, but
the resulting parameter trajectory is identical to computing the full
gradient and letting the optimizer zero frozen updates (the pre-guard
behavior, itself matching torch requires_grad=False semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _setup(cfg_name, **over):
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    cfg = get_config(cfg_name, mixed_precision=False, **over)
    model = get_model(cfg, train_mode=True)
    rng = jax.random.key(0)
    sample = np.zeros((1,) + tuple(cfg.input_shape) + (3,), np.float32)
    state = create_train_state(model, cfg, rng, sample, lr=1e-3,
                               frozen_backbone=True)
    tx = make_phase_optimizer(cfg, 1e-3, True, state.params)
    return cfg, model, state, tx


def _batch(cfg, rs):
    h, w = cfg.input_shape
    g = cfg.max_instances
    b = 2
    boxes = np.zeros((b, g, 4), np.float32)
    xy = rs.uniform(0.1, 0.5, (b, g, 2))
    wh = rs.uniform(0.15, 0.3, (b, g, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = np.minimum(xy + wh, 0.99)
    out = {"image": rs.randn(b, h, w, 3).astype(np.float32) * 0.1,
           "boxes": boxes,
           "labels": rs.randint(0, cfg.num_classes, (b, g)).astype(np.int32),
           "valid": np.ones((b, g), bool),
           "is_crowd": np.zeros((b, g), bool)}
    if cfg.net == "yolact":
        out["masks"] = (rs.rand(b, g, h // 4, w // 4) > 0.6).astype(
            np.float32)
    else:
        out["masks"] = (rs.rand(b, g, h, w) > 0.6).astype(np.uint8)
    return {k: jnp.asarray(v) for k, v in out.items()}


def _leaf_diff(a, b):
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_yolact_guard_invisible_frozen_phase():
    from instancesegmentation_tpu.ops.anchors import yolact_anchors
    from instancesegmentation_tpu.train.steps import make_yolact_train_step

    cfg, model, state, tx = _setup("yolact_synth", input_shape=(128, 128))
    anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
    batch = _batch(cfg, np.random.RandomState(0))
    rng = jax.random.key(7)

    guarded = jax.jit(make_yolact_train_step(
        model, tx, anchors, cfg, frozen_backbone=True))
    full = jax.jit(make_yolact_train_step(
        model, tx, anchors, cfg, frozen_backbone=False))

    sg, mg = guarded(state, batch, rng)
    sf, mf = full(state, batch, rng)
    assert float(mg["total"]) == pytest.approx(float(mf["total"]), rel=1e-6)
    assert _leaf_diff(sg.params, sf.params) < 1e-6
    # frozen backbone really does not move under the guard
    assert _leaf_diff(sg.params["backbone"],
                      state.params["backbone"]) == 0.0
    # something else did
    heads = {k: v for k, v in sg.params.items() if k != "backbone"}
    heads0 = {k: v for k, v in state.params.items() if k != "backbone"}
    assert _leaf_diff(heads, heads0) > 0.0


def test_guard_prunes_backward_ops():
    """The guarded frozen-phase jaxpr must be materially smaller: the
    frozen backbone's filter-gradient convolutions are gone."""
    from instancesegmentation_tpu.ops.anchors import yolact_anchors
    from instancesegmentation_tpu.train.steps import make_yolact_train_step

    cfg, model, state, tx = _setup("yolact_synth", input_shape=(128, 128))
    anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
    batch = _batch(cfg, np.random.RandomState(1))
    rng = jax.random.key(3)

    def n_conv(frozen):
        step = make_yolact_train_step(model, tx, anchors, cfg,
                                      frozen_backbone=frozen)
        jaxpr = jax.make_jaxpr(step)(state, batch, rng)
        return str(jaxpr).count("conv_general_dilated")

    assert n_conv(True) < n_conv(False)


def test_mask_rcnn_trainable_layers_pruned_even_unfrozen():
    """mask_rcnn trainable_layers=3 + frozen_bn: the guard applies in the
    UNFROZEN phase too (conv1/layer1/backbone-BN are permanently frozen,
    resnet50_fpn_model.py:163-180), and is numerically invisible."""
    from instancesegmentation_tpu.train.steps import make_mask_rcnn_train_step
    cfg, model, state, tx = _setup(
        "mask_rcnn_synth", input_shape=(96, 96),
        # the real configs' permanent-freeze settings (mask_rcnn_base)
        trainable_layers=3, frozen_bn=True)
    # rebuild for the unfrozen phase
    from instancesegmentation_tpu.train.state import make_phase_optimizer
    tx = make_phase_optimizer(cfg, 1e-3, False, state.params)
    assert cfg.trainable_layers < 5 and cfg.frozen_bn

    batch = _batch(cfg, np.random.RandomState(2))
    rng = jax.random.key(11)
    step = jax.jit(make_mask_rcnn_train_step(model, tx, cfg,
                                             frozen_backbone=False))
    s1, m1 = step(state, batch, rng)
    assert np.isfinite(float(m1["total"]))
    # permanently-frozen layers did not move even though phase is unfrozen
    # (backbone blocks are flat-named layer<i>_<j>)
    def sub(tree, prefix):
        return {k: v for k, v in tree.items() if k.startswith(prefix)}

    assert _leaf_diff(s1.params["backbone"]["conv1"],
                      state.params["backbone"]["conv1"]) == 0.0
    assert _leaf_diff(sub(s1.params["backbone"], "layer1_"),
                      sub(state.params["backbone"], "layer1_")) == 0.0
    # layer4 trained
    assert _leaf_diff(sub(s1.params["backbone"], "layer4_"),
                      sub(state.params["backbone"], "layer4_")) > 0.0
