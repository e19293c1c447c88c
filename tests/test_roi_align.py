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
        # torchvision adaptive grid: ceil(roi_size / out_size) per axis
        sy_n = s if s > 0 else max(1, int(np.ceil(rh / oh)))
        sx_n = s if s > 0 else max(1, int(np.ceil(rw / ow)))
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c)
                for sy in range(sy_n):
                    for sx in range(sx_n):
                        acc += sample(y1 + (i + (sy + 0.5) / sy_n) * bh,
                                      x1 + (j + (sx + 0.5) / sx_n) * bw)
                out[ri, i, j] = acc / (sy_n * sx_n)
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


@pytest.mark.parametrize("scale", [1.0, 0.25])
def test_roi_align_separable_adaptive_matches_golden(rng, scale):
    """sampling_ratio=-1 (torchvision's adaptive ceil(roi/out) grid — the
    default the reference's mask-target projection uses, roi_head.py:106)
    vs the scalar golden: small rois (grid 1), medium, and a roi spanning
    most of the source (grid ~3-4 per axis)."""
    feat = rng.randn(24, 32, 6).astype(np.float32)
    rois = np.array([[4, 4, 9, 8],            # < out_size -> 1 sample/bin
                     [0, 0, 16, 16],
                     [1, 2, 31, 23],          # near-full canvas
                     [2.5, 3.5, 30.2, 21.9]], np.float32) / scale
    golden = _numpy_roi_align(feat, rois, (7, 7), scale, -1)
    sep = np.asarray(ra.roi_align_separable(
        jnp.asarray(feat), jnp.asarray(rois), (7, 7), scale, -1))
    np.testing.assert_allclose(sep, golden, rtol=1e-4, atol=1e-4)
    # the deviation this closes was real: for large rois the fixed-2 grid
    # subsamples and disagrees with the adaptive result
    fixed2 = _numpy_roi_align(feat, rois, (7, 7), scale, 2)
    assert np.abs(fixed2[2] - golden[2]).max() > 1e-3


def test_adaptive_target_projection_large_roi():
    """28^2 gt-mask projection with a roi larger than 56 px: the adaptive
    grid must see every source pixel (a thin stripe entirely INSIDE a bin
    but between the fixed-2 sample points is invisible to sampling_ratio=2
    yet pooled by adaptive)."""
    hw = 112
    mask = np.zeros((hw, hw, 1), np.float32)
    mask[:, :] = 0.0
    # 1-px-wide horizontal stripes at rows 1 mod 4: bin height = 4 px at
    # roi 112 -> fixed-2 samples rows x.0+1.0/3.0-ish, adaptive (grid 4)
    # averages all rows
    mask[1::4, :] = 1.0
    rois = np.array([[0, 0, hw, hw]], np.float32)
    adaptive = np.asarray(ra.roi_align_separable(
        jnp.asarray(mask), jnp.asarray(rois), (28, 28), 1.0, -1))
    golden = _numpy_roi_align(mask, rois, (28, 28), 1.0, -1)
    np.testing.assert_allclose(adaptive, golden, rtol=1e-4, atol=1e-4)
    # every 4-px bin holds exactly one stripe: adaptive mean = 1/4 + the
    # bilinear spread, far from the fixed-2 estimate on the same bins
    fixed2 = np.asarray(ra.roi_align_separable(
        jnp.asarray(mask), jnp.asarray(rois), (28, 28), 1.0, 2))
    assert np.abs(adaptive - fixed2).max() > 0.05


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
