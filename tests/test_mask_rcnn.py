import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.models.mask_rcnn import proposals as P
from instancesegmentation_tpu.models.mask_rcnn import roi_heads as R


def test_assign_targets_to_anchors():
    anchors = jnp.array([[0, 0, 10, 10], [20, 20, 30, 30], [100, 100, 110, 110]],
                        jnp.float32)
    gt = jnp.array([[0, 0, 10, 10], [19, 19, 31, 31], [0, 0, 0, 0]], jnp.float32)
    valid = jnp.array([True, True, False])
    t = P.assign_targets_to_anchors(anchors, gt, valid)
    labels = np.asarray(t.labels)
    assert labels[0] == 1            # exact match
    assert labels[1] == 1            # iou > 0.7
    assert labels[2] == 0            # background
    # offsets of exact match are 0
    np.testing.assert_allclose(np.asarray(t.reg_targets)[0], 0, atol=1e-5)


def test_rpn_loss_finite():
    a = 64
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(np.concatenate([
        rng.uniform(0, 50, (a, 2)), rng.uniform(60, 100, (a, 2))], 1)
        .astype(np.float32))
    gt = jnp.array([[10, 10, 70, 70]] + [[0, 0, 0, 0]] * 3, jnp.float32)
    valid = jnp.array([True, False, False, False])
    t = P.assign_targets_to_anchors(anchors, gt, valid)
    obj = jnp.asarray(rng.randn(a).astype(np.float32))
    deltas = jnp.asarray(rng.randn(a, 4).astype(np.float32))
    lo, lb = P.rpn_loss(obj, deltas, t, jax.random.key(0))
    assert np.isfinite(float(lo)) and np.isfinite(float(lb))


def test_filter_proposals_static_shapes():
    rng = np.random.RandomState(1)
    level_sizes = (48, 12)
    n = sum(level_sizes)
    boxes = rng.uniform(0, 90, (n, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 30, (n, 2))], 1)
    # zero deltas decode to the anchors themselves
    props = P.filter_proposals(jnp.zeros((n, 4), jnp.float32),
                               jnp.asarray(rng.randn(n).astype(np.float32)),
                               jnp.asarray(boxes.astype(np.float32)),
                               level_sizes, (100, 100),
                               pre_nms_top_n=20, post_nms_top_n=16)
    assert props.boxes.shape == (16, 4)
    assert props.valid.shape == (16,)
    assert bool(np.asarray(props.valid).any())
    # clipped to image
    kept = np.asarray(props.boxes)[np.asarray(props.valid)]
    assert kept.min() >= 0 and kept.max() <= 100


def test_select_training_samples_includes_gt():
    rng = np.random.RandomState(2)
    proposals = jnp.asarray(rng.uniform(0, 50, (40, 4)).astype(np.float32))
    prop_valid = jnp.ones((40,), bool)
    gt = jnp.array([[10, 10, 30, 30], [0, 0, 0, 0]], jnp.float32)
    gt_labels = jnp.array([2, 0], jnp.int32)
    gt_valid = jnp.array([True, False])
    s = R.select_training_samples(proposals, prop_valid, gt, gt_labels,
                                  gt_valid, jax.random.key(0), num_samples=32)
    assert s.rois.shape == (32, 4)
    labels = np.asarray(s.labels)[np.asarray(s.valid)]
    # gt was appended to proposals, so at least one positive with label 3
    assert (labels == 3).sum() >= 1
    assert np.all((labels == 0) | (labels == 3))


def test_postprocess_detections_shapes():
    rng = np.random.RandomState(3)
    p, k = 50, 4
    logits = jnp.asarray(rng.randn(p, k).astype(np.float32) * 3)
    deltas = jnp.asarray(rng.randn(p, k, 4).astype(np.float32) * 0.1)
    props = jnp.asarray(np.concatenate([
        rng.uniform(0, 60, (p, 2)), rng.uniform(70, 120, (p, 2))], 1)
        .astype(np.float32))
    dets = R.postprocess_detections(logits, deltas, props,
                                    jnp.ones((p,), bool), (128, 128),
                                    max_det=20)
    assert dets.boxes.shape == (20, 4)
    v = np.asarray(dets.valid)
    assert v.any()
    assert np.all(np.asarray(dets.labels)[v] >= 1)
    assert np.all(np.asarray(dets.scores)[v] > R.SCORE_THRESH)


def _postprocess_inputs(seed, p, k, bg_bias=0.0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(p, k).astype(np.float32) * 3
    logits[:, 0] += bg_bias
    deltas = rng.randn(p, k, 4).astype(np.float32) * 0.1
    props = np.concatenate([rng.uniform(0, 60, (p, 2)),
                            rng.uniform(70, 120, (p, 2))], 1)
    return (jnp.asarray(logits), jnp.asarray(deltas),
            jnp.asarray(props.astype(np.float32)))


def _assert_same_detections(a, b):
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    assert va.sum() == vb.sum()
    np.testing.assert_allclose(np.asarray(a.scores)[va],
                               np.asarray(b.scores)[vb], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.labels)[va],
                                  np.asarray(b.labels)[vb])
    np.testing.assert_allclose(np.asarray(a.boxes)[va],
                               np.asarray(b.boxes)[vb], rtol=1e-6)


def test_postprocess_pooled_batched_nms_equals_per_class():
    """The pooled batched-NMS form (torchvision's own algorithm,
    roi_head.py:441-445) must equal the exhaustive per-class form exactly
    whenever the pool covers every candidate above score_thresh."""
    for seed in range(4):
        p, k = 64, 5
        logits, deltas, props = _postprocess_inputs(seed, p, k)
        args = (logits, deltas, props, jnp.ones((p,), bool), (128, 128))
        pooled = R.postprocess_detections(
            *args, max_det=20, num_candidates=p * (k - 1))
        per_class = R.postprocess_detections(*args, max_det=20,
                                             num_candidates=0)
        _assert_same_detections(pooled, per_class)


def test_postprocess_pooled_capped_equals_per_class_when_sparse():
    """With the candidate pool SMALLER than P*(K-1) but larger than the
    number of thresh-passing candidates (the trained-model regime: the
    reference's score filter passes a few hundred of the 20k), the capped
    pool is provably identical to the exhaustive form."""
    p, k = 400, 5                        # 1600 fg candidates
    # push ~90% of proposals' fg scores under 0.05 via a background bias
    logits, deltas, props = _postprocess_inputs(11, p, k, bg_bias=6.0)
    probs = np.asarray(jax.nn.softmax(logits, -1))[:, 1:]
    n_pass = int((probs > R.SCORE_THRESH).sum())
    assert 0 < n_pass < 512, n_pass      # the regime under test
    args = (logits, deltas, props, jnp.ones((p,), bool), (128, 128))
    capped = R.postprocess_detections(*args, max_det=50, num_candidates=512)
    per_class = R.postprocess_detections(*args, max_det=50, num_candidates=0)
    _assert_same_detections(capped, per_class)


def test_postprocess_reports_pool_saturation():
    """A dense scene (every (proposal, class) pair above threshold) must
    be OBSERVABLE: n_candidates carries the pre-pool above-threshold
    count so eval can flag pool overflow instead of silently dropping
    candidates (round-4 verdict item 7)."""
    p, k = 64, 5
    logits = jnp.full((p, k), 0.0).at[:, 0].set(-8.0)  # all fg likely
    deltas = jnp.zeros((p, k, 4))
    props = jnp.tile(jnp.asarray([[10.0, 10.0, 90.0, 90.0]]), (p, 1))
    args = (logits, deltas, props, jnp.ones((p,), bool), (128, 128))
    dense = R.postprocess_detections(*args, max_det=10, num_candidates=32)
    n_above = int(dense.n_candidates)
    assert n_above == p * (k - 1)            # every fg pair passes 0.05
    assert n_above > 32                      # i.e. the pool saturated
    # sparse control: the count matches the actual above-threshold pairs
    logits2, deltas2, props2 = _postprocess_inputs(11, 400, 5, bg_bias=6.0)
    probs = np.asarray(jax.nn.softmax(logits2, -1))[:, 1:]
    sparse = R.postprocess_detections(
        logits2, deltas2, props2, jnp.ones((400,), bool), (128, 128),
        max_det=50, num_candidates=512)
    # n_candidates also masks degenerate boxes; bound-check instead of
    # exact equality with the raw prob count
    assert int(sparse.n_candidates) <= int((probs > R.SCORE_THRESH).sum())
    assert int(sparse.n_candidates) < 512    # not saturated


def test_predictor_pool_stats_running_aggregate():
    """MaskRCNNPredictor._track_pool: running max/mean/saturation over
    batches (what evaluate_predictor prints)."""
    from instancesegmentation_tpu.models.mask_rcnn.predictor import \
        MaskRCNNPredictor
    pred = MaskRCNNPredictor.__new__(MaskRCNNPredictor)   # no model build
    pred.pool_size = 100
    pred.pool_stats = {"max": 0, "mean": 0.0, "images": 0, "saturated": 0}
    pred._track_pool(np.array([10, 120]))
    pred._track_pool(np.array([50]))
    pred._track_pool(np.array([], dtype=np.int32))   # padded-only group
    st = pred.pool_stats
    assert st["max"] == 120 and st["images"] == 3 and st["saturated"] == 1
    np.testing.assert_allclose(st["mean"], (10 + 120 + 50) / 3)
    # evaluate_predictor starts each eval fresh (no cumulative reports)
    pred.reset_pool_stats()
    assert pred.pool_stats == {"max": 0, "mean": 0.0, "images": 0,
                               "saturated": 0}


@pytest.mark.slow
def test_frozen_bn_and_trainable_layers():
    """FrozenBN + trainable_layers=3 parity (resnet50_fpn_model.py:163-199):
    in the UNFREEZE phase, conv1/bn1/layer1 and every backbone BN affine
    stay constant, batch_stats never update, layer2+ and FPN train."""
    import flax
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    from instancesegmentation_tpu.train.steps import make_mask_rcnn_train_step

    cfg = get_config("mask_rcnn_synth", input_shape=(64, 64), max_instances=4,
                     mixed_precision=False, frozen_bn=True,
                     trainable_layers=3)
    model = get_model(cfg, train_mode=True)
    b = 2
    sample = np.zeros((b, 64, 64, 3), np.float32)
    state = create_train_state(model, cfg, jax.random.key(0), sample,
                               lr=1e-2, frozen_backbone=False)
    tx = make_phase_optimizer(cfg, 1e-2, False, state.params)
    step = jax.jit(make_mask_rcnn_train_step(model, tx, cfg))

    m = cfg.max_instances
    batch = {
        "image": np.random.RandomState(0).randn(b, 64, 64, 3).astype(np.float32),
        "boxes": np.tile(np.array([[0.1, 0.1, 0.6, 0.7]], np.float32), (b, m, 1)),
        "labels": np.ones((b, m), np.int32),
        "masks": np.zeros((b, m, 64, 64), np.uint8),
        "valid": np.tile(np.arange(m) < 2, (b, 1)),
        "is_crowd": np.zeros((b, m), bool),
    }
    batch["masks"][:, :, 8:40, 8:40] = 1
    new, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                  jax.random.key(1))

    old_p = flax.traverse_util.flatten_dict(state.params)
    new_p = flax.traverse_util.flatten_dict(new.params)
    changed = {k for k in old_p
               if not np.allclose(np.asarray(old_p[k]), np.asarray(new_p[k]))}
    for k in old_p:
        is_backbone = k[0] == "backbone"
        perm_frozen = is_backbone and (
            k[1].startswith(("conv1", "bn1", "layer1"))
            or k[-2] in ("bn1", "bn2", "bn3", "down_bn"))
        if perm_frozen:
            assert k not in changed, k
    # sanity: upper stages and FPN actually train
    assert any(k[0] == "backbone" and k[1].startswith("layer4")
               and k[-1] == "kernel" for k in changed)
    assert any(k[0] == "fpn" for k in changed)
    # FrozenBN: statistics untouched
    old_s = flax.traverse_util.flatten_dict(state.batch_stats)
    new_s = flax.traverse_util.flatten_dict(new.batch_stats)
    for k in old_s:
        np.testing.assert_array_equal(np.asarray(old_s[k]),
                                      np.asarray(new_s[k]))

    # freeze phase additionally freezes the FPN (BackboneWithFPN,
    # faster_rcnn_framework.py:117-119)
    from instancesegmentation_tpu.train.state import backbone_trainability
    labels = flax.traverse_util.flatten_dict(backbone_trainability(
        state.params, True, net="mask_rcnn", trainable_layers=3,
        frozen_bn=True))
    assert all(v == "frozen" for k, v in labels.items() if k[0] == "fpn")
    assert all(v == "frozen" for k, v in labels.items() if k[0] == "backbone")
    assert any(v == "train" for k, v in labels.items()
               if k[0] not in ("backbone", "fpn"))


def test_mask_rcnn_freeze_phase_bn_stats_step():
    """The trainer's cfg.freeze_phase_bn_stats clone path for mask_rcnn
    (trainer._build_steps): a frozen-stats model built over a LIVE-BN
    config accepts the live train state unchanged and moves no batch
    statistics in a train step."""
    import flax
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    from instancesegmentation_tpu.train.steps import make_mask_rcnn_train_step

    cfg = get_config("mask_rcnn_synth", input_shape=(64, 64), max_instances=4,
                     mixed_precision=False, frozen_bn=False,
                     freeze_phase_bn_stats=True)
    live = get_model(cfg, train_mode=True)
    clone = get_model(cfg, train_mode=True, frozen_bn=True)
    b = 2
    sample = np.zeros((b, 64, 64, 3), np.float32)
    state = create_train_state(live, cfg, jax.random.key(0), sample,
                               lr=1e-2, frozen_backbone=True)
    tx = make_phase_optimizer(cfg, 1e-2, True, state.params)
    step = jax.jit(make_mask_rcnn_train_step(clone, tx, cfg,
                                             frozen_backbone=True))

    m = cfg.max_instances
    batch = {
        "image": np.random.RandomState(0).randn(b, 64, 64, 3).astype(np.float32),
        "boxes": np.tile(np.array([[0.1, 0.1, 0.6, 0.7]], np.float32), (b, m, 1)),
        "labels": np.ones((b, m), np.int32),
        "masks": np.zeros((b, m, 64, 64), np.uint8),
        "valid": np.tile(np.arange(m) < 2, (b, 1)),
        "is_crowd": np.zeros((b, m), bool),
    }
    batch["masks"][:, :, 8:40, 8:40] = 1
    new, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                        jax.random.key(1))
    assert np.isfinite(float(metrics["total"]))
    old_s = flax.traverse_util.flatten_dict(state.batch_stats)
    new_s = flax.traverse_util.flatten_dict(new.batch_stats)
    for k in old_s:
        np.testing.assert_array_equal(np.asarray(old_s[k]),
                                      np.asarray(new_s[k]))


@pytest.mark.slow
def test_mask_rcnn_train_step_smoke():
    """Tiny full train step: finite losses, one optimizer update."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    from instancesegmentation_tpu.train.steps import make_mask_rcnn_train_step

    cfg = get_config("mask_rcnn_synth", input_shape=(64, 64), max_instances=4,
                     mixed_precision=False)
    model = get_model(cfg, train_mode=True)
    b = 2
    sample = np.zeros((b, 64, 64, 3), np.float32)
    state = create_train_state(model, cfg, jax.random.key(0), sample,
                               lr=1e-3, frozen_backbone=True)
    tx = make_phase_optimizer(cfg, 1e-3, True, state.params)
    step = jax.jit(make_mask_rcnn_train_step(model, tx, cfg),
                   donate_argnums=0)

    m = cfg.max_instances
    batch = {
        "image": np.random.RandomState(0).randn(b, 64, 64, 3).astype(np.float32),
        "boxes": np.tile(np.array([[0.1, 0.1, 0.6, 0.7]], np.float32), (b, m, 1)),
        "labels": np.ones((b, m), np.int32),
        "masks": np.zeros((b, m, 64, 64), np.uint8),
        "valid": np.tile(np.arange(m) < 2, (b, 1)),
        "is_crowd": np.zeros((b, m), bool),
    }
    batch["masks"][:, :, 8:40, 8:40] = 1
    state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                          jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, metrics)
    assert int(state.step) == 1
    assert set(metrics) == {"loss_objectness", "loss_rpn_box_reg",
                            "loss_classifier", "loss_box_reg", "loss_mask",
                            "total"}


def test_train_loss_traces_nonsquare_bucket():
    """Resolution buckets: geometry is derived from the batch's static
    shape, so a non-square bucket must trace without touching
    cfg.input_shape (eval_shape = trace only, no compile)."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.mask_rcnn.meta import \
        make_mask_rcnn_train_fns

    cfg = get_config("mask_rcnn_synth", input_shape=(64, 64), max_instances=4,
                     mixed_precision=False)
    model = get_model(cfg, train_mode=True)
    b, m, hw = 2, 4, (64, 128)
    variables = model.init({"params": jax.random.key(0)},
                           np.zeros((1, 64, 64, 3), np.float32), True)
    loss_fn = make_mask_rcnn_train_fns(model, cfg, train=True)
    batch = {
        "image": jax.ShapeDtypeStruct((b,) + hw + (3,), jnp.float32),
        "boxes": jax.ShapeDtypeStruct((b, m, 4), jnp.float32),
        "labels": jax.ShapeDtypeStruct((b, m), jnp.int32),
        "masks": jax.ShapeDtypeStruct((b, m) + hw, jnp.uint8),
        "valid": jax.ShapeDtypeStruct((b, m), jnp.bool_),
        "is_crowd": jax.ShapeDtypeStruct((b, m), jnp.bool_),
    }
    out = jax.eval_shape(loss_fn, variables["params"],
                         variables.get("batch_stats", {}), batch,
                         jax.random.key(7))
    total = out[0]
    assert total.shape == ()


def test_maskrcnn_projection_matches_gather_roi_align():
    """The folded one-hot projection inside maskrcnn_loss must equal
    gathering the matched mask then running separable roi_align on it."""
    from instancesegmentation_tpu.models.mask_rcnn import roi_heads as R
    from instancesegmentation_tpu.ops import roi_align as ra

    rng = np.random.RandomState(3)
    g, hh, ww, m = 5, 64, 64, 7
    gt_masks = (rng.rand(g, hh, ww) > 0.5).astype(np.float32)
    rois = rng.uniform(2, 30, (m, 4)).astype(np.float32)
    rois[:, 2:] += rois[:, :2]
    gi = rng.randint(0, g, (m,))

    mask_logits = jnp.zeros((m, 28, 28, 4), jnp.float32)
    labels = jnp.ones((m,), jnp.int32)
    valid = jnp.ones((m,), bool)
    loss_new = float(R.maskrcnn_loss(mask_logits, jnp.asarray(rois),
                                     labels, jnp.asarray(gi), valid,
                                     jnp.asarray(gt_masks)))

    # golden: explicit gather + per-roi separable roi_align
    tgt = np.stack([np.asarray(ra.roi_align_separable(
        jnp.asarray(gt_masks[gidx])[:, :, None], jnp.asarray(r[None]),
        (28, 28), 1.0, 2))[0, :, :, 0] for r, gidx in zip(rois, gi)])
    bce = -(tgt * np.log(0.5) + (1 - tgt) * np.log(0.5))
    loss_gold = float(bce.mean(axis=(1, 2)).mean())
    np.testing.assert_allclose(loss_new, loss_gold, rtol=1e-5, atol=1e-6)


def test_maskrcnn_projection_pool_first_branch():
    """Same golden check for the pool-first contraction order (taken when
    G*28 < H — small instance budget, larger image); both orders must be
    numerically identical to the explicit gather."""
    from instancesegmentation_tpu.models.mask_rcnn import roi_heads as R
    from instancesegmentation_tpu.ops import roi_align as ra

    rng = np.random.RandomState(5)
    g, hh, ww, m = 2, 96, 96, 5          # g*28 = 56 < 96 -> pool-first
    gt_masks = (rng.rand(g, hh, ww) > 0.5).astype(np.float32)
    rois = rng.uniform(2, 40, (m, 4)).astype(np.float32)
    rois[:, 2:] += rois[:, :2]
    gi = rng.randint(0, g, (m,))

    mask_logits = jnp.zeros((m, 28, 28, 4), jnp.float32)
    labels = jnp.ones((m,), jnp.int32)
    valid = jnp.ones((m,), bool)
    loss_new = float(R.maskrcnn_loss(mask_logits, jnp.asarray(rois),
                                     labels, jnp.asarray(gi), valid,
                                     jnp.asarray(gt_masks)))
    tgt = np.stack([np.asarray(ra.roi_align_separable(
        jnp.asarray(gt_masks[gidx])[:, :, None], jnp.asarray(r[None]),
        (28, 28), 1.0, 2))[0, :, :, 0] for r, gidx in zip(rois, gi)])
    bce = -(tgt * np.log(0.5) + (1 - tgt) * np.log(0.5))
    loss_gold = float(bce.mean(axis=(1, 2)).mean())
    np.testing.assert_allclose(loss_new, loss_gold, rtol=1e-5, atol=1e-6)


def test_flatten_dense_matches_flattened_nn_dense():
    """_FlattenDense (TwoMLPHead fc6) must be numerically identical to the
    nn.Dense-on-flattened-input it replaced, with an IDENTICAL param tree
    ((h*w*c, out) kernel + bias) so existing checkpoints and the torch
    converter (utils/torch_weights.py:145-148) keep loading. The only
    difference is the contraction shape: (h, w, c) contracted directly in
    dot_general instead of flattening the activation (the flatten merges
    spatial dims into the minor dim = a whole-tensor relayout copy)."""
    import flax.linen as nn

    from instancesegmentation_tpu.models.mask_rcnn.model import _FlattenDense

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(6, 7, 7, 32).astype(np.float32))

    mod = _FlattenDense(16, dtype=jnp.float32)
    variables = mod.init(jax.random.key(0), x)
    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]
    assert kernel.shape == (7 * 7 * 32, 16) and bias.shape == (16,)

    y = mod.apply(variables, x)
    ref = nn.Dense(16, dtype=jnp.float32).apply(
        {"params": {"kernel": kernel, "bias": bias}},
        x.reshape(x.shape[0], -1))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
