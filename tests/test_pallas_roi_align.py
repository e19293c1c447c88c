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


def test_pallas_vjp_matches_separable_grad(rng):
    """The analytic custom VJP equals autodiff through the separable form
    (the golden trains Mask R-CNN when not on TPU)."""
    import jax
    from instancesegmentation_tpu.ops.pallas.roi_align import roi_align_tpu

    feat = rng.randn(16, 16, 8).astype(np.float32)
    rois = np.array([[4, 4, 40, 60], [0, 0, 16, 16], [2.5, 3.5, 30.2, 44.9],
                     [10, 6, 60, 50]], np.float32)
    cot = rng.randn(4, 7, 7, 8).astype(np.float32)

    def f_pallas(f):
        out = roi_align_tpu(f, jnp.asarray(rois), (7, 7), 0.25, 2, True)
        return jnp.vdot(out, jnp.asarray(cot))

    def f_golden(f):
        out = ra.roi_align_separable(f, jnp.asarray(rois), (7, 7), 0.25, 2)
        return jnp.vdot(out, jnp.asarray(cot))

    g_pallas = np.asarray(jax.grad(f_pallas)(jnp.asarray(feat)))
    g_golden = np.asarray(jax.grad(f_golden)(jnp.asarray(feat)))
    np.testing.assert_allclose(g_pallas, g_golden, rtol=2e-2, atol=2e-2)
    assert np.abs(g_pallas).sum() > 0


def test_multiscale_pallas_matches_separable(rng):
    import jax
    from instancesegmentation_tpu.ops.pallas.roi_align import \
        multiscale_roi_align_pallas

    feats = tuple(jnp.asarray(rng.randn(s, s, 8).astype(np.float32))
                  for s in (32, 16, 8, 4))
    scales = (0.25, 0.125, 0.0625, 0.03125)
    # small + large rois to hit different levels
    rois = jnp.asarray(np.array(
        [[0, 0, 30, 30], [0, 0, 120, 128], [5, 5, 9, 9], [8, 16, 100, 90]],
        np.float32))
    golden = np.asarray(ra.multiscale_roi_align_separable(
        feats, rois, (7, 7), scales))
    ours = np.asarray(multiscale_roi_align_pallas(
        feats, rois, (7, 7), scales, interpret=True))
    np.testing.assert_allclose(ours, golden, rtol=2e-2, atol=2e-2)


def test_pallas_aligned_matches_gather(rng):
    """aligned=True threads through the kernel, the VJP, and multiscale."""
    import jax
    from instancesegmentation_tpu.ops.pallas.roi_align import roi_align_tpu

    feat = rng.randn(16, 16, 8).astype(np.float32)
    rois = np.array([[4, 4, 40, 60], [0, 0, 16, 16], [2.5, 3.5, 30.2, 44.9]],
                    np.float32)
    golden = np.asarray(ra.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                     (7, 7), 0.25, 2, aligned=True))
    ours = np.asarray(roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois),
                                       (7, 7), 0.25, 2, roi_block=2,
                                       interpret=True, aligned=True))
    np.testing.assert_allclose(ours, golden, rtol=2e-2, atol=2e-2)

    cot = rng.randn(3, 7, 7, 8).astype(np.float32)

    def f_pallas(f):
        out = roi_align_tpu(f, jnp.asarray(rois), (7, 7), 0.25, 2, True, True)
        return jnp.vdot(out, jnp.asarray(cot))

    def f_golden(f):
        out = ra.roi_align_separable(f, jnp.asarray(rois), (7, 7), 0.25, 2,
                                     aligned=True)
        return jnp.vdot(out, jnp.asarray(cot))

    g_pallas = np.asarray(jax.grad(f_pallas)(jnp.asarray(feat)))
    g_golden = np.asarray(jax.grad(f_golden)(jnp.asarray(feat)))
    np.testing.assert_allclose(g_pallas, g_golden, rtol=2e-2, atol=2e-2)


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
