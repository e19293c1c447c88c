"""End-to-end predict.py CLI modes (video / fps / predict) on CPU.

The reference's predict.py surface (predict.py:54-119: video loop with
XVID writer + fps overlay, get_FPS harness, single-image mode) was only
covered at the predictor-object level before; this drives the actual CLI
``main()`` against a saved checkpoint of random-init weights.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """Random-init yolact variables saved in the trainer's checkpoint
    format (what predict.py --checkpoint loads)."""
    import jax

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.checkpoints import CheckpointIO

    cfg = get_config("yolact_synth", input_shape=(96, 96),
                     mixed_precision=False)
    model = get_model(cfg, train_mode=False)
    x = np.zeros((1, 96, 96, 3), np.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    root = tmp_path_factory.mktemp("predict_cli")
    io = CheckpointIO(str(root / "ckpt"))
    io.save("best_epoch_weights",
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})})
    io.wait()
    return str(root / "ckpt" / "best_epoch_weights")


_COMMON = ["--config", "yolact_synth", "--confidence", "0.01",
           "--set", "input_shape=(96,96)", "--set", "mixed_precision=False"]


@pytest.mark.slow
def test_predict_cli_video_roundtrip(ckpt_dir, tmp_path):
    import cv2

    import predict

    src = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"XVID"), 5.0, (120, 100))
    rs = np.random.RandomState(0)
    n_frames = 4
    for _ in range(n_frames):
        w.write(rs.randint(0, 255, (100, 120, 3)).astype(np.uint8))
    w.release()

    dst = str(tmp_path / "out.avi")
    rc = predict.main(_COMMON + ["--mode", "video", "--video_path", src,
                                 "--video_save_path", dst,
                                 "--checkpoint", ckpt_dir])
    assert rc == 0
    assert os.path.exists(dst) and os.path.getsize(dst) > 0
    cap = cv2.VideoCapture(dst)
    got = 0
    while cap.read()[0]:
        got += 1
    cap.release()
    assert got == n_frames


@pytest.mark.slow
def test_predict_cli_fps_and_single_image(ckpt_dir, tmp_path, capsys):
    import cv2

    import predict

    rc = predict.main(_COMMON + ["--mode", "fps", "--test_interval", "2",
                                 "--checkpoint", ckpt_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "FPS" in out and "seconds" in out

    img_path = str(tmp_path / "frame.png")
    cv2.imwrite(img_path, np.random.RandomState(1)
                .randint(0, 255, (80, 110, 3)).astype(np.uint8))
    save_dir = str(tmp_path / "img_out")
    rc = predict.main(_COMMON + ["--mode", "predict", "--image", img_path,
                                 "--dir_save_path", save_dir,
                                 "--checkpoint", ckpt_dir])
    assert rc == 0
