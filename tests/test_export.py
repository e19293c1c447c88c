"""Export CLI: StableHLO serialization, symbolic-batch artifacts, replay
verification (the reference's export.py ONNX surface, :96-219)."""

import os

import numpy as np
import pytest


def test_yolact_export_dynamic_batch_verify(tmp_path):
    """One artifact serves batch 1 AND batch 2 (symbolic batch dim), replay
    matches the native outputs."""
    import export as export_cli

    out = str(tmp_path / "yolact.stablehlo")
    rc = export_cli.main([
        "--config", "yolact_synth", "--output", out,
        "--dynamic_batch", "--verify", "--platforms", "cpu",
        "--set", "mixed_precision=false", "--set", "input_shape=96",
    ])
    assert rc == 0
    assert os.path.getsize(out) > 1e5

    # artifact replays standalone at a batch size never passed to export
    import jax
    with open(out, "rb") as f:
        replay = jax.export.deserialize(f.read())
    x = np.random.RandomState(1).randn(3, 96, 96, 3).astype(np.float32)
    dets = replay.call(x)
    leaves = jax.tree_util.tree_leaves(dets)
    assert all(l.shape[0] == 3 for l in leaves)
    assert np.isfinite(np.asarray(leaves[0])).all()


@pytest.mark.slow
def test_mask_rcnn_export_verify(tmp_path):
    """Mask R-CNN symbolic-batch export + replay verify (reference exports
    both families the same way, export.py:158-162)."""
    import export as export_cli

    out = str(tmp_path / "rcnn.stablehlo")
    rc = export_cli.main([
        "--config", "mask_rcnn_synth", "--output", out, "--verify",
        "--dynamic_batch", "--platforms", "cpu",
        "--set", "mixed_precision=false", "--set", "input_shape=64",
        "--set", "max_detections=10",
    ])
    assert rc == 0
    assert os.path.getsize(out) > 1e5
