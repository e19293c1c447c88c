import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.ops import boxes as box_ops


def test_point_form_center_size_roundtrip():
    b = jnp.array([[0.5, 0.5, 0.2, 0.4], [0.1, 0.9, 0.05, 0.1]])
    xyxy = box_ops.point_form(b)
    np.testing.assert_allclose(np.asarray(box_ops.center_size(xyxy)), np.asarray(b),
                               rtol=1e-6, atol=1e-7)


def test_jaccard_hand_values():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0],   # inter 1, union 7
                   [0.0, 0.0, 2.0, 2.0],   # identical
                   [5.0, 5.0, 6.0, 6.0]])  # disjoint
    iou = np.asarray(box_ops.jaccard(a, b))
    np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-5)


def test_jaccard_iscrowd_divides_by_area_a():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])      # area 4
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])      # inter 1
    out = np.asarray(box_ops.jaccard(a, b, iscrowd=True))
    np.testing.assert_allclose(out[0, 0], 0.25, atol=1e-5)


def test_jaccard_degenerate_boxes_no_nan():
    z = jnp.zeros((3, 4))
    out = np.asarray(box_ops.jaccard(z, z))
    assert np.all(np.isfinite(out)) and np.all(out == 0)


def test_yolact_encode_decode_roundtrip(rng):
    anchors = jnp.array(rng.uniform(0.2, 0.8, (50, 4)).astype(np.float32))
    gt = rng.uniform(0, 1, (50, 4)).astype(np.float32)
    gt_xyxy = np.stack([np.minimum(gt[:, 0], gt[:, 2]) * 0.5,
                        np.minimum(gt[:, 1], gt[:, 3]) * 0.5,
                        np.maximum(gt[:, 0], gt[:, 2]) * 0.5 + 0.4,
                        np.maximum(gt[:, 1], gt[:, 3]) * 0.5 + 0.4], axis=1)
    enc = box_ops.encode_yolact(jnp.asarray(gt_xyxy), anchors)
    dec = box_ops.decode_yolact(enc, anchors)
    np.testing.assert_allclose(np.asarray(dec), gt_xyxy, rtol=1e-3, atol=1e-4)


def test_yolact_encode_golden():
    # hand-computed: anchor (cx=.5,cy=.5,w=.2,h=.2), gt (.4,.4,.6,.8)
    anchors = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    gt = jnp.array([[0.4, 0.4, 0.6, 0.8]])
    enc = np.asarray(box_ops.encode_yolact(gt, anchors))[0]
    # g_cxcy = ((.5,.6)-(.5,.5))/(0.1*.2) = (0, 5); g_wh = log((.2,.4)/.2)/0.2
    np.testing.assert_allclose(enc, [0.0, 5.0, 0.0, np.log(2.0) / 0.2], atol=1e-4)


def test_rcnn_encode_decode_roundtrip(rng):
    props = rng.uniform(0, 100, (30, 4)).astype(np.float32)
    props = np.stack([np.minimum(props[:, 0], props[:, 2]),
                      np.minimum(props[:, 1], props[:, 3]),
                      np.maximum(props[:, 0], props[:, 2]) + 5,
                      np.maximum(props[:, 1], props[:, 3]) + 5], axis=1)
    gt = props + rng.uniform(-3, 3, (30, 4)).astype(np.float32)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    w = (10.0, 10.0, 5.0, 5.0)  # box-head weights (faster_rcnn_framework.py:321)
    enc = box_ops.encode_rcnn(jnp.asarray(gt), jnp.asarray(props), w)
    dec = box_ops.decode_rcnn(enc, jnp.asarray(props), w)
    np.testing.assert_allclose(np.asarray(dec), gt, rtol=1e-3, atol=1e-3)


def test_decode_rcnn_clips_exp():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    huge = jnp.array([[0.0, 0.0, 100.0, 100.0]])
    dec = np.asarray(box_ops.decode_rcnn(huge, boxes))
    assert np.all(np.isfinite(dec))
    assert (dec[0, 2] - dec[0, 0]) <= 10 * 1000 / 16 + 1


def test_clip_and_small_mask():
    boxes = jnp.array([[-5.0, -5.0, 20.0, 20.0], [1.0, 1.0, 2.0, 30.0]])
    clipped = np.asarray(box_ops.clip_boxes_to_image(boxes, (16, 16)))
    np.testing.assert_allclose(clipped[0], [0, 0, 16, 16])
    np.testing.assert_allclose(clipped[1], [1, 1, 2, 16])
    mask = np.asarray(box_ops.small_box_mask(jnp.asarray(clipped), 2.0))
    assert mask.tolist() == [True, False]


def test_yolact_correct_boxes():
    boxes = jnp.array([[-0.1, 0.2, 0.5, 1.3]])
    out = np.asarray(box_ops.yolact_correct_boxes(boxes, (100, 200)))
    np.testing.assert_allclose(out[0], [0.0, 20.0, 100.0, 100.0], atol=1e-4)
