import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.ops import roi_align as ra


def _numpy_roi_align(feat_hwc, rois, out_size, scale, sampling_ratio,
                     aligned=False):
    """Golden: scalar-loop roi_align with torchvision semantics (bilinear
    samples averaged per bin, zero outside [-1, size]); ``aligned=True``
    shifts the grid by -0.5 and drops the min-1 roi clamp."""
    h, w, c = feat_hwc.shape
    oh, ow = out_size
    s = sampling_ratio
    out = np.zeros((len(rois), oh, ow, c), np.float64)

    def sample(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
                + feat_hwc[y0, x1] * (1 - ly) * lx
                + feat_hwc[y1, x0] * ly * (1 - lx)
                + feat_hwc[y1, x1] * ly * lx)

    for ri, roi in enumerate(np.asarray(rois) * scale
                             - (0.5 if aligned else 0.0)):
        x1, y1, x2, y2 = roi
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / ow, rh / oh
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c)
                for sy in range(s):
                    for sx in range(s):
                        acc += sample(y1 + (i + (sy + 0.5) / s) * bh,
                                      x1 + (j + (sx + 0.5) / s) * bw)
                out[ri, i, j] = acc / (s * s)
    return out.astype(np.float32)


@pytest.mark.parametrize("scale,sr", [(1.0, 2), (0.25, 2), (0.5, 4)])
def test_roi_align_matches_golden(rng, scale, sr):
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.array([[4, 4, 40, 60], [0, 0, 16, 16], [10, 6, 90, 80],
                     [2.5, 3.5, 30.2, 44.9]], np.float32)
    ours = np.asarray(ra.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                   (7, 7), scale, sr))
    golden = _numpy_roi_align(feat, rois, (7, 7), scale, sr)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scale", [1.0, 0.25])
def test_roi_align_aligned_matches_golden(rng, scale):
    """aligned=True (half-pixel-corrected grid) vs the scalar golden, for
    both the gather and separable formulations."""
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.array([[4, 4, 40, 60], [0, 0, 16, 16], [10, 6, 90, 80],
                     [2.5, 3.5, 30.2, 44.9]], np.float32)
    golden = _numpy_roi_align(feat, rois, (7, 7), scale, 2, aligned=True)
    ours = np.asarray(ra.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                   (7, 7), scale, 2, aligned=True))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)
    sep = np.asarray(ra.roi_align_separable(
        jnp.asarray(feat), jnp.asarray(rois), (7, 7), scale, 2, aligned=True))
    np.testing.assert_allclose(sep, golden, rtol=1e-4, atol=1e-4)
    # and it actually differs from aligned=False (the half-pixel bias)
    off = np.asarray(ra.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                  (7, 7), scale, 2, aligned=False))
    assert np.abs(off - golden).max() > 1e-3


@pytest.mark.parametrize("scale,sr", [(1.0, 2), (0.25, 2), (0.5, 4), (0.25, 1)])
def test_roi_align_separable_equals_gather(rng, scale, sr):
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.array([[4, 4, 40, 60], [0, 0, 16, 16], [10, 6, 90, 80],
                     [2.5, 3.5, 30.2, 44.9], [0, 0, 0, 0]], np.float32)
    a = np.asarray(ra.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                (7, 7), scale, sr))
    b = np.asarray(ra.roi_align_separable(jnp.asarray(feat),
                                          jnp.asarray(rois), (7, 7), scale, sr))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_multiscale_separable_equals_gather(rng):
    feats = [jnp.asarray(rng.randn(32, 32, 4).astype(np.float32)),
             jnp.asarray(rng.randn(16, 16, 4).astype(np.float32)),
             jnp.asarray(rng.randn(8, 8, 4).astype(np.float32)),
             jnp.asarray(rng.randn(4, 4, 4).astype(np.float32))]
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
    rois = jnp.array([[0, 0, 32, 32], [0, 0, 224, 224], [5, 5, 100, 60]],
                     jnp.float32)
    a = np.asarray(ra.multiscale_roi_align(feats, rois, (7, 7), scales))
    b = np.asarray(ra.multiscale_roi_align_separable(feats, rois, (7, 7),
                                                     scales))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_roi_align_separable_gradients_flow():
    import jax
    feat = jnp.ones((16, 16, 4))
    rois = jnp.array([[2.0, 2.0, 10.0, 10.0]])

    def f(x):
        return ra.roi_align_separable(x, rois, (7, 7), 1.0, 2).sum()
    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_roi_align_zero_roi_gives_zeros():
    feat = jnp.ones((16, 16, 4))
    rois = jnp.zeros((2, 4))
    out = np.asarray(ra.roi_align(feat, rois, (7, 7), 1.0, 2))
    assert out.shape == (2, 7, 7, 4)
    assert np.all(np.isfinite(out))


def test_fpn_level_assignment():
    rois = jnp.array([
        [0, 0, 32, 32],       # sqrt(1024)=32 -> lvl 4+log2(32/224)=~1.2 -> clamp 2
        [0, 0, 224, 224],     # canonical -> 4
        [0, 0, 448, 448],     # -> 5
        [0, 0, 1000, 1000],   # -> clamp 5
    ], jnp.float32)
    lvl = np.asarray(ra.fpn_level_assignment(rois))
    assert lvl.tolist() == [0, 2, 3, 3]


def test_multiscale_selects_per_roi(rng):
    feats = [jnp.asarray(rng.randn(64, 64, 4).astype(np.float32)),
             jnp.asarray(rng.randn(32, 32, 4).astype(np.float32)),
             jnp.asarray(rng.randn(16, 16, 4).astype(np.float32)),
             jnp.asarray(rng.randn(8, 8, 4).astype(np.float32))]
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
    rois = jnp.array([[0, 0, 32, 32], [0, 0, 224, 224]], jnp.float32)
    out = np.asarray(ra.multiscale_roi_align(feats, rois, (7, 7), scales))
    lvl = np.asarray(ra.fpn_level_assignment(rois))
    for i, l in enumerate(lvl):
        ref = np.asarray(ra.roi_align(feats[l], rois[i:i + 1], (7, 7),
                                      scales[l]))
        np.testing.assert_allclose(out[i], ref[0], rtol=1e-5, atol=1e-6)
