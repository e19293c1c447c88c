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
