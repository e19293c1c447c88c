import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.models.yolact.model import Yolact
from instancesegmentation_tpu.ops.anchors import yolact_anchors


@pytest.fixture(scope="module")
def small_model():
    model = Yolact(num_classes=4, train_mode=True, dtype=jnp.float32)
    x = np.zeros((2, 64, 64, 3), np.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=True)
    return model, variables


def test_forward_shapes_match_anchor_count(small_model):
    model, variables = small_model
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    boxes, classes, coefs, proto, segs = model.apply(
        variables, x, train=True, mutable=["batch_stats"])[0]
    a = yolact_anchors((64, 64)).shape[0]
    assert boxes.shape == (2, a, 4)
    assert classes.shape == (2, a, 4)
    assert coefs.shape == (2, a, 32)
    assert proto.shape == (2, 16, 16, 32)       # input/4
    assert segs.shape == (2, 8, 8, 3)           # P3 res, num_classes-1
    # tanh bound on coefficients (yolact.py:109-112)
    assert np.abs(np.asarray(coefs)).max() <= 1.0 + 1e-5


def test_eval_mode_softmax(small_model):
    model, variables = small_model
    eval_model = Yolact(num_classes=4, train_mode=False, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    out = eval_model.apply(variables, x, train=False)
    assert len(out) == 4
    probs = np.asarray(out[1])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert probs.min() >= 0


def test_batch_stats_update_only_in_train(small_model):
    model, variables = small_model
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32) * 5
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_loss_padded_invariance(small_model):
    """Adding extra padded gt slots must not change any loss value."""
    from instancesegmentation_tpu.models.yolact.loss import multi_loss
    model, variables = small_model
    x = np.random.RandomState(2).randn(2, 64, 64, 3).astype(np.float32)
    preds = model.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    anchors = jnp.asarray(yolact_anchors((64, 64)))

    def batch(g):
        b = {"boxes": np.zeros((2, g, 4), np.float32),
             "labels": np.zeros((2, g), np.int32),
             "masks": np.zeros((2, g, 16, 16), np.uint8),
             "valid": np.zeros((2, g), bool),
             "is_crowd": np.zeros((2, g), bool), "anchors": anchors}
        b["boxes"][:, 0] = [0.2, 0.2, 0.7, 0.8]
        b["labels"][:, 0] = 1
        b["masks"][:, 0, 4:12, 4:12] = 1
        b["valid"][:, 0] = True
        return {k: jnp.asarray(v) for k, v in b.items()}

    rng = jax.random.key(0)
    l4 = multi_loss(preds, batch(4), rng, num_classes=4)
    l9 = multi_loss(preds, batch(9), rng, num_classes=4)
    for k in l4:
        np.testing.assert_allclose(np.asarray(l4[k]), np.asarray(l9[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
        assert np.isfinite(float(l4[k]))


def test_loss_all_constants_applied(small_model):
    """B/C/M normalized by total positives; S by batch (yolact_training
    .py:181-186). With no positives, losses must be ~0 / finite."""
    from instancesegmentation_tpu.models.yolact.loss import multi_loss
    model, variables = small_model
    x = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32)
    preds = model.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    anchors = jnp.asarray(yolact_anchors((64, 64)))
    g = 4
    empty = {"boxes": jnp.zeros((2, g, 4)), "labels": jnp.zeros((2, g), jnp.int32),
             "masks": jnp.zeros((2, g, 16, 16), jnp.uint8),
             "valid": jnp.zeros((2, g), bool),
             "is_crowd": jnp.zeros((2, g), bool), "anchors": anchors}
    out = multi_loss(preds, empty, jax.random.key(0), num_classes=4)
    assert float(out["B"]) == 0.0
    assert float(out["M"]) == 0.0
    assert np.isfinite(float(out["C"]))
    assert np.isfinite(float(out["S"]))


def test_s2d_stem_equals_direct_conv():
    """S2DStemConv == the reference 7x7/s2 pad-3 conv, exactly (the
    space-to-depth rewrite is a coordinate change, not an approximation),
    with the nn.Conv-compatible param tree (kernel (7,7,Cin,F))."""
    from instancesegmentation_tpu.models.resnet import S2DStemConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
    mod = S2DStemConv(8, dtype=jnp.float32)
    v = mod.init(jax.random.key(0), x)
    assert v["params"]["kernel"].shape == (7, 7, 3, 8)
    out = mod.apply(v, x)
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_stem_odd_shape_same_param_tree():
    """Odd H/W inputs must use the SAME 'kernel' param (direct 7x7/s2
    lowering), so a checkpoint initialized at even shapes applies at odd
    shapes and vice versa — no parity-dependent parameter tree."""
    from instancesegmentation_tpu.models.resnet import S2DStemConv

    rng = np.random.RandomState(1)
    mod = S2DStemConv(8, dtype=jnp.float32)
    x_even = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    x_odd = jnp.asarray(rng.randn(1, 33, 47, 3).astype(np.float32))
    v_even = mod.init(jax.random.key(0), x_even)
    v_odd = mod.init(jax.random.key(0), x_odd)
    assert set(v_even["params"]) == set(v_odd["params"]) == {"kernel"}
    # even-init params apply cleanly at odd shapes and match the direct conv
    out = mod.apply(v_even, x_odd)
    ref = jax.lax.conv_general_dilated(
        x_odd, v_even["params"]["kernel"], window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_frozen_bn_variant_same_tree_frozen_stats(small_model):
    """cfg.freeze_phase_bn_stats applies a frozen_bn=True clone of the
    model to the same checkpoint: the variable tree must be identical and
    batch statistics must NOT move under train=True."""
    model, variables = small_model
    frozen = Yolact(num_classes=4, train_mode=True, dtype=jnp.float32,
                    frozen_bn=True)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32) * 5
    out, mut = frozen.apply(variables, x, train=True,
                            mutable=["batch_stats"])
    # same tree: the frozen clone accepted the live model's variables and
    # returned the same collection structure
    assert (jax.tree_util.tree_structure(mut["batch_stats"])
            == jax.tree_util.tree_structure(variables["batch_stats"]))
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert all(np.allclose(o, n) for o, n in zip(old, new))
    # and it equals the live model's eval-mode forward (same stats path)
    eval_out = model.apply(variables, x, train=False,
                           mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(eval_out[0]),
                               rtol=1e-5, atol=1e-5)


def test_proto_double_resolution_and_loss():
    """cfg.proto_double: prototypes at input/2 (one extra upsample+conv in
    ProtoNet); the collate/loss chain follows cfg.proto_shape, and the
    default tree is unchanged (the extra conv only exists when enabled)."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.yolact.loss import multi_loss
    from instancesegmentation_tpu.ops.anchors import yolact_anchors

    cfg = get_config("yolact_synth", input_shape=(64, 64), max_instances=4,
                     mixed_precision=False, proto_double=True)
    assert cfg.proto_shape == (32, 32)
    model = get_model(cfg, train_mode=True)
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=True)
    assert "proto3_0" in variables["params"]["proto_net"]
    preds, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert preds[3].shape == (1, 32, 32, 32)     # input/2 protos
    assert preds[4].shape == (1, 8, 8, 3)        # seg head still at P3

    # loss consumes proto-res gt masks (host collate uses cfg.proto_shape)
    hp, wp = cfg.proto_shape
    m = cfg.max_instances
    batch = {
        "boxes": jnp.asarray(
            np.tile([[0.1, 0.1, 0.6, 0.7]], (1, m, 1)).astype(np.float32)),
        "labels": jnp.zeros((1, m), jnp.int32),
        "masks": jnp.zeros((1, m, hp, wp)).at[:, :, 4:20, 4:20].set(1.0),
        "valid": jnp.asarray(np.arange(m)[None] < 2),
        "is_crowd": jnp.zeros((1, m), bool),
    }
    anchors = jnp.asarray(yolact_anchors((64, 64)))
    losses = multi_loss(preds, {**batch, "anchors": anchors},
                        jax.random.key(1), num_classes=cfg.num_classes + 1)
    assert all(np.isfinite(float(v)) for v in losses.values())

    # default (proto_double=False) param tree does NOT carry the extra conv
    base = get_model(cfg.replace(proto_double=False), train_mode=True)
    vb = base.init({"params": jax.random.key(0)}, x, train=True)
    assert "proto3_0" not in vb["params"]["proto_net"]
