import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.train.checkpoints import CheckpointIO
from instancesegmentation_tpu.train.state import TrainState


def _state(v: float):
    return TrainState(step=jnp.asarray(3, jnp.int32),
                      params={"w": jnp.full((4, 4), v)},
                      batch_stats={"m": jnp.ones((4,)) * 2},
                      opt_state={"mu": jnp.zeros((4, 4))},
                      ema_params={"w": jnp.full((4, 4), v * 0.5)})


def test_save_restore_roundtrip(tmp_path):
    io = CheckpointIO(str(tmp_path))
    io.save("last_epoch_weights", _state(7.0))
    restored = io.restore("last_epoch_weights", _state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
    np.testing.assert_allclose(np.asarray(restored.ema_params["w"]), 3.5)
    assert int(restored.step) == 3


def test_best_last_aliases(tmp_path):
    io = CheckpointIO(str(tmp_path))
    io.save_epoch(0, _state(1.0), 1.0, 1.0, is_best=True)
    io.save_epoch(1, _state(2.0), 0.9, 0.8, is_best=False)
    io.wait()
    assert io.has("best_epoch_weights") and io.has("last_epoch_weights")
    best = io.restore("best_epoch_weights", _state(0.0))
    last = io.restore("last_epoch_weights", _state(0.0))
    np.testing.assert_allclose(np.asarray(best.params["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(last.params["w"]), 2.0)
    # epoch snapshot files are opt-in
    assert io.latest_epoch_name() == "last_epoch_weights"


def test_overwrite_allowed(tmp_path):
    io = CheckpointIO(str(tmp_path))
    io.save("best_epoch_weights", _state(1.0))
    io.save("best_epoch_weights", _state(9.0))
    out = io.restore("best_epoch_weights", _state(0.0))
    np.testing.assert_allclose(np.asarray(out.params["w"]), 9.0)


def test_gather_objects_single_host():
    from instancesegmentation_tpu.parallel.multihost import (gather_objects,
                                                             is_main_process,
                                                             world_size)
    assert world_size() == 1 and is_main_process()
    assert gather_objects([{"a": 1}, {"b": 2}]) == [{"a": 1}, {"b": 2}]


def test_merge_eval_results_single_host_identity():
    """Dedup is per-IMAGE across hosts (coco_eval.py:11-31), so a single
    host's results — including same-image detections — pass unchanged."""
    from instancesegmentation_tpu.parallel.multihost import merge_eval_results
    r = [{"image_id": 1, "category_id": 2, "bbox": [0, 0, 1, 1], "score": 0.5},
         {"image_id": 1, "category_id": 2, "bbox": [0, 0, 2, 2], "score": 0.4},
         {"image_id": 2, "category_id": 2, "bbox": [0, 0, 1, 1], "score": 0.5}]
    out = merge_eval_results(r)
    assert out == r
