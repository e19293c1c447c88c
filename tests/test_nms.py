import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.ops import nms


def _ref_greedy_nms(boxes, scores, thr):
    """Plain numpy greedy NMS for cross-checking (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter)
        suppressed |= iou > thr
    return sorted(keep)


def test_nms_mask_matches_greedy(rng):
    n = 64
    centers = rng.uniform(10, 90, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep = np.asarray(nms.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert sorted(np.nonzero(keep)[0].tolist()) == _ref_greedy_nms(boxes, scores, 0.5)


def test_nms_fixpoint_matches_greedy_large(rng):
    """Dense overlapping boxes with long suppression chains."""
    for seed in range(3):
        r = np.random.RandomState(seed)
        n = 512
        centers = r.uniform(20, 80, (n, 2))
        wh = r.uniform(10, 40, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
        scores = r.uniform(0, 1, n).astype(np.float32)
        keep = np.asarray(nms.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        assert sorted(np.nonzero(keep)[0].tolist()) == \
            _ref_greedy_nms(boxes, scores, 0.5), seed


def test_nms_mask_respects_valid():
    boxes = jnp.array([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    keep = np.asarray(nms.nms_mask(boxes, scores, 0.5, jnp.array([True, False])))
    assert keep.tolist() == [True, False]


def test_batched_nms_separates_classes():
    b = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    s = jnp.array([0.9, 0.8])
    same = np.asarray(nms.batched_nms_mask(b, s, jnp.array([0, 0]), 0.5))
    diff = np.asarray(nms.batched_nms_mask(b, s, jnp.array([0, 1]), 0.5))
    assert same.tolist() == [True, False]
    assert diff.tolist() == [True, True]


def test_fast_nms_suppression():
    # two near-identical boxes (class 0) + one distinct (class 1)
    boxes = jnp.array([[0.1, 0.1, 0.4, 0.4],
                       [0.11, 0.1, 0.41, 0.4],
                       [0.6, 0.6, 0.9, 0.9]])
    scores = jnp.array([[0.9, 0.0],
                        [0.8, 0.0],
                        [0.0, 0.7]])
    coefs = jnp.ones((3, 8))
    out = nms.fast_nms(boxes, scores, coefs, score_thresh=0.05,
                       iou_thresh=0.5, top_k=3, max_detections=5)
    valid = np.asarray(out.valid)
    assert valid.sum() == 2
    kept_scores = sorted(np.asarray(out.scores)[valid].tolist(), reverse=True)
    np.testing.assert_allclose(kept_scores, [0.9, 0.7], atol=1e-6)
    kept_classes = np.asarray(out.classes)[valid].tolist()
    assert set(kept_classes) == {0, 1}


def test_traditional_nms_matches_greedy_per_class():
    boxes = jnp.array([[0.1, 0.1, 0.4, 0.4],
                       [0.11, 0.1, 0.41, 0.4],    # suppressed by #0 (class 0)
                       [0.6, 0.6, 0.9, 0.9],      # class 1
                       [0.1, 0.1, 0.4, 0.4]])     # class 1, no class-0 conflict
    scores = jnp.array([[0.9, 0.0],
                        [0.8, 0.0],
                        [0.0, 0.7],
                        [0.0, 0.6]])
    out = nms.traditional_nms(boxes, scores, jnp.ones((4, 8)),
                              score_thresh=0.05, iou_thresh=0.5,
                              pre_top_k=4, max_detections=5)
    v = np.asarray(out.valid)
    assert v.sum() == 3
    kept = sorted(np.asarray(out.scores)[v].tolist(), reverse=True)
    np.testing.assert_allclose(kept, [0.9, 0.7, 0.6], atol=1e-6)


def test_fast_nms_score_threshold_filters_all():
    boxes = jnp.array([[0.1, 0.1, 0.4, 0.4]])
    scores = jnp.array([[0.01, 0.02]])
    out = nms.fast_nms(boxes, scores, jnp.ones((1, 4)), 0.5, 0.5, top_k=1)
    assert not np.any(np.asarray(out.valid))


def test_nms_blocked_edges(rng):
    """Blocked-path edges: n not a multiple of the block, validity masks,
    and a deterministic suppression chain that crosses block boundaries
    (box k overlaps only box k+1, scores descending, so greedy keeps the
    even-indexed boxes -- exercises cross-block hit_prev exactly)."""
    # chain crossing blocks: 300 boxes, each overlapping its neighbor
    n = 300
    x = np.arange(n, dtype=np.float32) * 6.0        # 10-wide, 6 apart: IoU(k,k+1)=4/16=0.25
    boxes = np.stack([x, np.zeros(n, np.float32),
                      x + 10.0, np.full(n, 10.0, np.float32)], 1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    keep = np.asarray(nms.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.2))
    assert sorted(np.nonzero(keep)[0].tolist()) == _ref_greedy_nms(boxes, scores, 0.2)
    assert np.nonzero(keep)[0].tolist() == list(range(0, n, 2))

    # random boxes at awkward sizes, with invalid entries
    for n in (130, 1000):
        r = np.random.RandomState(n)
        centers = r.uniform(20, 80, (n, 2))
        wh = r.uniform(10, 40, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
        scores = r.uniform(0.01, 1, n).astype(np.float32)
        valid = r.rand(n) > 0.3
        keep = np.asarray(nms.nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                       0.5, jnp.asarray(valid)))
        ref = _ref_greedy_nms(boxes[valid], scores[valid], 0.5)
        ref_global = sorted(np.nonzero(valid)[0][ref].tolist())
        assert sorted(np.nonzero(keep)[0].tolist()) == ref_global
