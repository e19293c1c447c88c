import jax.numpy as jnp
import pytest

from instancesegmentation_tpu.config import get_config, list_configs


def test_registry_has_all_families():
    names = list_configs()
    for expect in ("yolact_base", "mask_rcnn_base", "yolact_coco",
                   "mask_rcnn_coco", "yolact_verseg", "mask_rcnn_verseg",
                   "yolact_synth", "mask_rcnn_synth"):
        assert expect in names


def test_reference_hyperparameters():
    """Spot-check the constants the reference pins (configs/*.py)."""
    y = get_config("yolact_base")
    assert y.input_shape == (544, 544)
    assert y.anchors_size == (24, 48, 96, 192, 384)
    assert y.freeze_batch_size == 14 and y.unfreeze_batch_size == 8
    assert y.init_lr == 1e-4 and y.min_lr == pytest.approx(1e-6)
    assert y.momentum == 0.937 and y.optimizer_type == "adam"
    assert y.pos_thresh == 0.5 and y.neg_thresh == 0.4 and y.negpos_ratio == 3
    assert y.confidence == 0.5 and y.nms_iou == 0.3
    assert y.eval_confidence == 0.05 and y.eval_nms_iou == 0.5
    assert y.patience == 10 and y.seed == 704
    assert y.num_classes == 20
    assert y.proto_shape == (136, 136)

    m = get_config("mask_rcnn_base")
    assert m.optimizer_type == "sgd" and m.momentum == 0.9
    assert m.freeze_batch_size == 4 and m.unfreeze_batch_size == 2


def test_classes_path_resolution(tmp_path):
    p = tmp_path / "cls.txt"
    p.write_text("a\nb\nc\n")
    cfg = get_config("yolact_base", class_names=(), classes_path=str(p))
    assert cfg.class_names == ("a", "b", "c")
    assert cfg.num_classes == 3


def test_coco_config_classes():
    cfg = get_config("yolact_coco")
    assert cfg.num_classes == 80


def test_overrides_and_dtype():
    cfg = get_config("yolact_base", mixed_precision=False)
    assert cfg.compute_dtype == jnp.float32
    cfg = get_config("yolact_base")
    assert cfg.compute_dtype == jnp.bfloat16


def test_frozen():
    cfg = get_config("yolact_base")
    with pytest.raises(Exception):
        cfg.init_lr = 5.0


def test_cli_set_overrides():
    """train.py --set KEY=VAL parsing: type coercion from the field."""
    import sys
    sys.path.insert(0, "/root/repo")
    from train import parse_set_overrides

    cfg = get_config("mask_rcnn_synth")
    o = parse_set_overrides(
        ["roi_align_aligned=true", "init_lr=5e-5", "trainable_layers=4",
         "resolution_buckets=((64,128),(96,96))", "lr_decay_type=step"], cfg)
    assert o["roi_align_aligned"] is True
    assert o["init_lr"] == 5e-5 and isinstance(o["init_lr"], float)
    assert o["trainable_layers"] == 4
    assert o["resolution_buckets"] == ((64, 128), (96, 96))
    assert o["lr_decay_type"] == "step"
    cfg2 = cfg.replace(**o)
    assert cfg2.roi_align_aligned and cfg2.init_lr == 5e-5

    with pytest.raises(SystemExit):
        parse_set_overrides(["not_a_field=1"], cfg)
    with pytest.raises(SystemExit):
        parse_set_overrides(["malformed"], cfg)


def test_cli_set_overrides_coercion_errors():
    """Malformed values exit cleanly; scalars broadcast to tuple fields."""
    import sys
    sys.path.insert(0, "/root/repo")
    from train import parse_set_overrides

    cfg = get_config("mask_rcnn_synth")
    # scalar for a tuple field broadcasts
    o = parse_set_overrides(["input_shape=544"], cfg)
    assert o["input_shape"] == (544, 544)
    # malformed literals / wrong types exit with a message, not a traceback
    for bad in ["input_shape=(544,", "init_lr=abc", "trainable_layers=3.5",
                "input_shape=foo"]:
        with pytest.raises(SystemExit):
            parse_set_overrides([bad], cfg)
