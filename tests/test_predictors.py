"""Predictor round-trips with random-init weights (no checkpoint needed):
exercises preprocess -> jitted infer -> host finishing -> overlay."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def image(rng):
    return rng.randint(0, 255, (100, 140, 3)).astype(np.uint8)


def _random_variables(cfg, model):
    x = np.zeros((1,) + tuple(cfg.input_shape) + (3,), np.float32)
    return model.init({"params": jax.random.key(0)}, x, train=False)


@pytest.mark.slow
def test_yolact_predictor_roundtrip(image):
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.yolact.predictor import YolactPredictor

    cfg = get_config("yolact_synth", input_shape=(96, 96),
                     mixed_precision=False, confidence=0.01)
    model = get_model(cfg, train_mode=False)
    pred = YolactPredictor(cfg, variables=_random_variables(cfg, model))

    det = pred.raw_detect(image)
    h, w = image.shape[:2]
    assert det["masks_arg"].shape == (h, w)
    assert det["boxes"].shape[1] == 4 if len(det["boxes"]) else True
    if len(det["boxes"]):
        assert det["boxes"][:, 0].min() >= 0
        assert det["boxes"][:, 2].max() <= w + 1e-3

    out = pred.detect_image(image)
    assert out.shape == image.shape and out.dtype == np.uint8

    boxes, scores, classes, masks = pred.get_map_out(image)
    assert len(boxes) == len(scores) == len(classes) == len(masks)


@pytest.mark.slow
def test_mask_rcnn_predictor_roundtrip(image):
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.mask_rcnn.predictor import \
        MaskRCNNPredictor

    cfg = get_config("mask_rcnn_synth", input_shape=(64, 64),
                     mixed_precision=False, confidence=0.01,
                     max_detections=20)
    model = get_model(cfg, train_mode=False)
    pred = MaskRCNNPredictor(cfg, variables=_random_variables(cfg, model))

    det = pred.raw_detect(image)
    h, w = image.shape[:2]
    if len(det["boxes"]):
        assert det["masks"].shape[1:] == (h, w)
        assert np.all(det["classes"] >= 0)

    out = pred.detect_image(image)
    assert out.shape == image.shape and out.dtype == np.uint8


def test_paste_mask_geometry():
    from instancesegmentation_tpu.models.mask_rcnn.predictor import paste_mask
    m = np.ones((28, 28), np.float32)
    out = paste_mask(m, np.array([10.0, 20.0, 30.0, 50.0]), 60, 60)
    assert out.shape == (60, 60)
    assert out[35, 20]                   # inside the box
    assert not out[5, 5]                 # far outside
    # clipped box partially off-image
    out2 = paste_mask(m, np.array([-10.0, -10.0, 10.0, 10.0]), 60, 60)
    assert out2[2, 2] and not out2[30, 30]


@pytest.mark.slow
def test_mask_rcnn_predictor_bucketed_keep_aspect(rng):
    """Bucketed configs evaluate keep-aspect: each image maps to its
    nearest bucket, a chunk with mixed aspect ratios dispatches per
    bucket group, and boxes come back in ORIGINAL image coords."""
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.data.aspect_ratio import nearest_bucket
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.models.mask_rcnn.predictor import \
        MaskRCNNPredictor

    cfg = get_config("mask_rcnn_synth", input_shape=(64, 64),
                     resolution_buckets=((64, 64), (48, 80), (80, 48)),
                     mixed_precision=False, confidence=0.01,
                     max_detections=10)
    model = get_model(cfg, train_mode=False)
    pred = MaskRCNNPredictor(cfg, variables=_random_variables(cfg, model))

    wide = rng.randint(0, 255, (60, 100, 3)).astype(np.uint8)
    tall = rng.randint(0, 255, (100, 60, 3)).astype(np.uint8)
    # preprocess picks the right bucket and pads to it
    x_w, scale_w = pred._preprocess(wide)
    assert x_w.shape[1:3] == nearest_bucket(60, 100, cfg.resolution_buckets)
    assert x_w.shape[1:3] == (48, 80)
    # keep-aspect: both axes share one scale factor
    assert abs(scale_w[0] - scale_w[1]) < 0.05

    dets = pred.raw_detect_batch([wide, tall, wide])
    assert len(dets) == 3
    for det, im in zip(dets, (wide, tall, wide)):
        h, w = im.shape[:2]
        if len(det["boxes"]):
            assert det["boxes"][:, 0::2].max() <= w + 1e-3
            assert det["boxes"][:, 1::2].max() <= h + 1e-3
            assert det["masks"].shape[1:] == (h, w)
