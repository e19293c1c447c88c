"""Pallas RoIAlign kernel vs the jnp golden, in interpret mode (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.ops import roi_align as ra
from instancesegmentation_tpu.ops.pallas.roi_align import roi_align_pallas


@pytest.mark.parametrize("scale", [1.0, 0.25])
def test_pallas_matches_golden_interpret(rng, scale):
    feat = rng.randn(16, 16, 8).astype(np.float32)
    rois = np.array([[4, 4, 40, 60], [0, 0, 16, 16], [2.5, 3.5, 30.2, 44.9],
                     [0, 0, 0, 0], [10, 6, 60, 50]], np.float32)
    golden = np.asarray(ra.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                     (7, 7), scale, 2))
    ours = np.asarray(roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois),
                                       (7, 7), scale, 2, roi_block=2,
                                       interpret=True))
    # the kernel keeps the feature map in bf16 (VMEM budget: f32 P2 maps
    # exceed 16MB), so compare at bf16 precision
    np.testing.assert_allclose(ours, golden, rtol=2e-2, atol=2e-2)


def test_pallas_roi_padding(rng):
    """Roi count not divisible by roi_block."""
    feat = rng.randn(8, 8, 4).astype(np.float32)
    rois = np.array([[0, 0, 8, 8], [1, 1, 5, 7], [2, 0, 6, 6]], np.float32)
    golden = np.asarray(ra.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                     (7, 7), 1.0, 2))
    ours = np.asarray(roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois),
                                       (7, 7), 1.0, 2, roi_block=2,
                                       interpret=True))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=2e-2, atol=2e-2)
