import jax
import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.ops import boxes as box_ops
from instancesegmentation_tpu.ops import matcher


def _pad(arr, n, fill=0.0):
    out = np.full((n,) + arr.shape[1:], fill, dtype=np.float32)
    out[:len(arr)] = arr
    return out


def test_match_yolact_basic():
    anchors = jnp.array([
        [0.25, 0.25, 0.5, 0.5],   # overlaps gt0 heavily
        [0.75, 0.75, 0.5, 0.5],   # overlaps gt1 heavily
        [0.50, 0.50, 0.1, 0.1],   # low overlap with both
    ])
    gt_boxes = jnp.asarray(_pad(np.array([[0.0, 0.0, 0.5, 0.5],
                                          [0.5, 0.5, 1.0, 1.0]]), 4))
    gt_labels = jnp.asarray(_pad(np.array([2, 7]), 4)).astype(jnp.int32)
    valid = jnp.array([True, True, False, False])
    crowd = jnp.zeros(4, bool)
    m = matcher.match_yolact(0.5, 0.4, gt_boxes, gt_labels, valid, crowd, anchors)
    conf = np.asarray(m.conf)
    assert conf[0] == 3 and conf[1] == 8        # class + 1
    assert conf[2] in (0, -1)                    # low overlap -> bg or ignore
    assert np.asarray(m.matched_idx)[0] == 0
    assert np.asarray(m.matched_idx)[1] == 1


def test_match_yolact_force_best_anchor():
    # gt that overlaps nothing above neg_thresh still claims its argmax anchor
    anchors = jnp.array([[0.1, 0.1, 0.2, 0.2], [0.9, 0.9, 0.2, 0.2]])
    gt_boxes = jnp.asarray(_pad(np.array([[0.8, 0.8, 0.82, 0.82]]), 2))
    gt_labels = jnp.zeros(2, jnp.int32)
    valid = jnp.array([True, False])
    crowd = jnp.zeros(2, bool)
    m = matcher.match_yolact(0.5, 0.4, gt_boxes, gt_labels, valid, crowd, anchors)
    assert np.asarray(m.conf)[1] == 1            # forced positive (overlap->2)
    assert np.asarray(m.conf)[0] == 0


def test_match_yolact_crowd_ignore():
    # anchor 0 sits inside the crowd region; anchor 1 is the fg gt's best match
    anchors = jnp.array([[0.5, 0.5, 0.4, 0.4], [0.005, 0.005, 0.01, 0.01]])
    gt_boxes = jnp.array([[0.0, 0.0, 0.01, 0.01], [0.2, 0.2, 0.9, 0.9]])
    gt_labels = jnp.zeros(2, jnp.int32)
    valid = jnp.array([True, True])
    crowd = jnp.array([False, True])
    m = matcher.match_yolact(0.5, 0.4, gt_boxes, gt_labels, valid, crowd, anchors)
    # anchor 0 is bg vs the tiny fg gt, but crowd inter/area_anchor = 1 > 0.7 -> ignore
    assert np.asarray(m.conf)[0] == -1
    assert np.asarray(m.conf)[1] == 1  # force-matched to the fg gt


def test_match_yolact_no_gt():
    anchors = jnp.array([[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.1, 0.1]])
    gt_boxes = jnp.zeros((3, 4))
    gt_labels = jnp.zeros(3, jnp.int32)
    valid = jnp.zeros(3, bool)
    crowd = jnp.zeros(3, bool)
    m = matcher.match_yolact(0.5, 0.4, gt_boxes, gt_labels, valid, crowd, anchors)
    assert np.all(np.asarray(m.conf) == 0)
    assert np.all(np.isfinite(np.asarray(m.offsets)))


def test_match_yolact_force_match_overrides_larger_argmax():
    """Regression (review finding): gt0's best anchor is anchor0, but
    anchor0's own argmax gt is gt1 (> 0). The force-match must still give
    anchor0 to gt0 (torch writes unconditionally), so EVERY fg gt has at
    least one positive anchor."""
    # IoUs (hand-computed): a0-gt0 0.0625, a0-gt1 0.145, a1-gt1 0.198,
    # a1-gt0 0 -> anchor0's argmax is gt1, but gt0's best anchor is anchor0
    # and gt1's best anchor is anchor1.
    anchors = jnp.array([[0.2, 0.2, 0.4, 0.4],    # anchor0 = [0,0,.4,.4]
                         [0.7, 0.7, 0.4, 0.4]])   # anchor1 = [.5,.5,.9,.9]
    gt_boxes = jnp.array([[0.0, 0.0, 0.1, 0.1],       # gt0: tiny, in anchor0
                          [0.05, 0.05, 0.95, 0.95]])  # gt1: big, best anchor1
    gt_labels = jnp.array([0, 1], jnp.int32)
    valid = jnp.array([True, True])
    crowd = jnp.zeros(2, bool)
    m = matcher.match_yolact(0.5, 0.4, gt_boxes, gt_labels, valid, crowd,
                             anchors)
    idx = np.asarray(m.matched_idx)
    # sanity: anchor0's raw argmax is gt1 (higher IoU with anchor0)
    from instancesegmentation_tpu.ops import boxes as box_ops
    ov = np.asarray(box_ops.jaccard(gt_boxes, box_ops.point_form(anchors)))
    assert ov[1, 0] > ov[0, 0] and np.argmax(ov[0]) == 0 and np.argmax(ov[1]) == 1
    # the force-match must hand anchor0 to gt0
    assert idx[0] == 0 and idx[1] == 1
    assert set(idx.tolist()) == {0, 1}   # every gt has a positive anchor


def test_match_yolact_no_gt_many_anchors():
    """Regression: with A > G, padded gt rows must NOT claim anchor index
    == G (the invalid-scatter sentinel must be out of bounds for the
    ANCHOR-sized arrays)."""
    a = 64
    anchors = jnp.stack([jnp.full((a,), 0.5), jnp.full((a,), 0.5),
                         jnp.full((a,), 0.1), jnp.full((a,), 0.1)], axis=1)
    g = 8
    m = matcher.match_yolact(0.5, 0.4, jnp.zeros((g, 4)),
                             jnp.zeros(g, jnp.int32), jnp.zeros(g, bool),
                             jnp.zeros(g, bool), anchors)
    assert np.all(np.asarray(m.conf) == 0)


def test_match_rcnn_thresholds():
    # quality rows = gt, cols = anchors
    q = jnp.array([[0.8, 0.5, 0.2, 0.0],
                   [0.1, 0.6, 0.35, 0.0]])
    valid = jnp.array([True, True])
    out = np.asarray(matcher.match_rcnn(q, valid, 0.7, 0.3, False))
    assert out[0] == 0                      # 0.8 >= 0.7
    assert out[1] == matcher.BETWEEN_THRESHOLDS
    assert out[2] == matcher.BETWEEN_THRESHOLDS
    assert out[3] == matcher.BELOW_LOW_THRESHOLD


def test_match_rcnn_low_quality_recovery():
    q = jnp.array([[0.8, 0.5, 0.2, 0.0],
                   [0.1, 0.6, 0.35, 0.0]])
    valid = jnp.array([True, True])
    out = np.asarray(matcher.match_rcnn(q, valid, 0.7, 0.3, True))
    assert out[0] == 0
    assert out[1] == 1                      # gt1's best anchor recovered
    assert out[2] == matcher.BETWEEN_THRESHOLDS
    # anchor 3 ties gt's best? no: best_per_gt are 0.8 / 0.6 -> stays below-low
    assert out[3] == matcher.BELOW_LOW_THRESHOLD


def test_match_rcnn_padded_gt_ignored():
    q = jnp.array([[0.9, 0.9, 0.9, 0.9],
                   [0.1, 0.2, 0.1, 0.1]])
    valid = jnp.array([False, True])
    out = np.asarray(matcher.match_rcnn(q, valid, 0.7, 0.3, True))
    assert np.all(out != 0)                 # padded gt 0 never matched


def test_balanced_sample_counts():
    labels = jnp.asarray(np.array([1] * 10 + [0] * 500 + [-1] * 20), jnp.int32)
    valid = jnp.ones(530, bool)
    pos, neg = matcher.balanced_sample(labels, valid, 256, 0.5, jax.random.key(0))
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 10                   # all positives (< 128 cap)
    assert neg.sum() == 246                  # 256 - 10
    assert not np.any(pos & neg)
    assert np.all(np.asarray(labels)[pos] == 1)
    assert np.all(np.asarray(labels)[neg] == 0)


def test_balanced_sample_caps_positives():
    labels = jnp.asarray(np.array([1] * 300 + [0] * 300), jnp.int32)
    valid = jnp.ones(600, bool)
    pos, neg = matcher.balanced_sample(labels, valid, 256, 0.5, jax.random.key(1))
    assert np.asarray(pos).sum() == 128
    assert np.asarray(neg).sum() == 128
