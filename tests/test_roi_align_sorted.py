"""Golden tests: level-sorted batched MultiScaleRoIAlign kernel vs the
separable-matmul reference (itself golden-tested against the gather
form / torchvision semantics). Interpret mode, CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.ops.pallas.roi_align_sorted import (
    make_canvas_spec, multiscale_roi_align_sorted, pack_fpn_levels,
    sort_rois_by_level)
from instancesegmentation_tpu.ops.roi_align import (
    fpn_level_assignment, multiscale_roi_align_separable)

SCALES = (0.25, 0.125, 0.0625, 0.03125)


def _feats(rs, b, base=32, c=128, dtype=jnp.float32):
    shapes = [(base, base), (base // 2, base // 2),
              (base // 4, base // 4), (base // 8, base // 8)]
    return [jnp.asarray(rs.randn(b, h, w, c), dtype) for h, w in shapes]


def _rois(rs, b, r, img=128.0):
    """Mix of sizes so all four levels are hit (plus degenerate zeros)."""
    x1 = rs.uniform(0, img * 0.6, (b, r))
    y1 = rs.uniform(0, img * 0.6, (b, r))
    # widths spanning tiny (level0) .. huge (level3)
    w = rs.choice([4, 16, 40, 90, 160, 400], (b, r)) * rs.uniform(
        0.5, 1.5, (b, r))
    h = w * rs.uniform(0.6, 1.6, (b, r))
    rois = np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)
    rois[:, -1] = 0.0          # a degenerate all-zero roi per image
    return jnp.asarray(rois)


@pytest.mark.parametrize("aligned", [False, True])
def test_sorted_matches_separable(aligned):
    rs = np.random.RandomState(0)
    b, r = 2, 21
    feats = _feats(rs, b)
    rois = _rois(rs, b, r)

    ref = jax.vmap(lambda f2, f3, f4, f5, rr: multiscale_roi_align_separable(
        (f2, f3, f4, f5), rr, (7, 7), SCALES, aligned=aligned))(
        *feats, rois)                                     # (B, R, 7, 7, C)

    out = multiscale_roi_align_sorted(feats, rois, (7, 7), SCALES,
                                      aligned=aligned, rb=4, interpret=True)
    # every real slot matches the reference at its original roi index
    perm = np.asarray(out.perm)
    real = np.asarray(out.real)
    got = np.asarray(out.feats, np.float32)
    want = np.asarray(ref, np.float32)
    assert real.sum() == b * r
    for bi in range(b):
        for slot in range(got.shape[1]):
            if not real[bi, slot]:
                np.testing.assert_array_equal(got[bi, slot], 0.0)
                continue
            np.testing.assert_allclose(
                got[bi, slot], want[bi, perm[bi, slot]], atol=0.02,
                rtol=0.02)


def test_every_roi_slotted_once():
    rs = np.random.RandomState(1)
    b, r, rb = 3, 17, 4
    rois = _rois(rs, b, r)
    spec = make_canvas_spec([(32, 32), (16, 16), (8, 8), (4, 4)], 128)
    srt = sort_rois_by_level(rois, spec, SCALES, (7, 7), rb, False)
    for bi in range(b):
        perm = np.asarray(srt.perm[bi])
        real = np.asarray(srt.real[bi])
        assert sorted(perm[real].tolist()) == list(range(r))
        # block levels ascending and consistent with slot geometry
        blk = np.asarray(srt.block_lvl[bi])
        assert (np.diff(blk) >= 0).all()
        lvls = np.asarray(fpn_level_assignment(rois[bi]))
        # slot geometry rows (Hl, Wl) consistent with the roi's level
        geom_h = np.asarray(srt.geom[bi, 4, :])
        for slot in np.nonzero(real)[0]:
            assert geom_h[slot] == spec.hs[lvls[perm[slot]]]
            assert blk[slot // rb] == lvls[perm[slot]]


def test_pack_unpack_roundtrip():
    rs = np.random.RandomState(2)
    feats = _feats(rs, 2, base=16, c=256)
    spec = make_canvas_spec([f.shape[1:3] for f in feats], 256)
    canvas = pack_fpn_levels(feats, spec)
    assert canvas.shape == (2, spec.nc, spec.rows, spec.wmax * spec.cb)
    # level 1 contents land at its row offset
    lvl1 = np.asarray(canvas.reshape(2, spec.nc, spec.rows, spec.wmax,
                                     spec.cb))
    h1, w1 = feats[1].shape[1:3]
    got = lvl1[:, :, spec.row_off[1]:spec.row_off[1] + h1, :w1]
    got = np.moveaxis(got, 1, 3).reshape(2, h1, w1, 256)
    np.testing.assert_allclose(
        got, np.asarray(feats[1], np.float32).astype(np.float32),
        atol=0.01, rtol=0.01)


@pytest.mark.parametrize("aligned", [False])
def test_sorted_backward_matches_separable(aligned):
    rs = np.random.RandomState(3)
    b, r = 2, 13
    feats = _feats(rs, b, base=32, c=128)
    rois = _rois(rs, b, r)
    w_ref = jnp.asarray(rs.randn(b, r, 7, 7, 128), jnp.float32)

    def loss_ref(fs):
        o = jax.vmap(lambda f2, f3, f4, f5, rr:
                     multiscale_roi_align_separable(
                         (f2, f3, f4, f5), rr, (7, 7), SCALES,
                         aligned=aligned))(*fs, rois)
        return jnp.sum(o * w_ref)

    def loss_sorted(fs):
        out = multiscale_roi_align_sorted(list(fs), rois, (7, 7), SCALES,
                                          aligned=aligned, rb=4,
                                          interpret=True)
        # weights permuted into slot order (dummy slots get zero weight)
        w_slot = jnp.take_along_axis(
            w_ref, jnp.clip(out.perm, 0, r - 1)[:, :, None, None, None],
            axis=1)
        w_slot = w_slot * out.real[:, :, None, None, None]
        return jnp.sum(out.feats.astype(jnp.float32) * w_slot)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(tuple(feats))
    l_srt, g_srt = jax.value_and_grad(loss_sorted)(tuple(feats))
    assert float(l_srt) == pytest.approx(float(l_ref), rel=2e-2)
    for gr, gs in zip(g_ref, g_srt):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   atol=0.05, rtol=0.05)


# ---------------------------------------------------------------------------
# end-to-end integration: the sorted backend is numerically equivalent in
# the full Mask R-CNN train step and inference graph (interpret mode)
# ---------------------------------------------------------------------------

def _rcnn_setup():
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    cfg = get_config("mask_rcnn_synth", input_shape=(96, 96),
                     mixed_precision=False)
    model = get_model(cfg, train_mode=True)
    rng = jax.random.key(0)
    sample = np.zeros((1, 96, 96, 3), np.float32)
    state = create_train_state(model, cfg, rng, sample, lr=1e-3,
                               frozen_backbone=False)
    tx = make_phase_optimizer(cfg, 1e-3, False, state.params)
    return cfg, model, state, tx


def _rcnn_batch(cfg, rs, b=2):
    h, w = cfg.input_shape
    g = cfg.max_instances
    boxes = np.zeros((b, g, 4), np.float32)
    xy = rs.uniform(0.1, 0.5, (b, g, 2))
    wh = rs.uniform(0.15, 0.3, (b, g, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = np.minimum(xy + wh, 0.99)
    return {"image": jnp.asarray(rs.randn(b, h, w, 3), jnp.float32) * 0.1,
            "boxes": jnp.asarray(boxes),
            "labels": jnp.asarray(rs.randint(0, cfg.num_classes, (b, g)),
                                  jnp.int32),
            "valid": jnp.ones((b, g), bool),
            "is_crowd": jnp.zeros((b, g), bool),
            "masks": jnp.asarray((rs.rand(b, g, h, w) > 0.6), jnp.uint8)}


def test_sorted_backend_train_step_equivalent(monkeypatch):
    from instancesegmentation_tpu.train.steps import make_mask_rcnn_train_step
    cfg, model, state, tx = _rcnn_setup()
    batch = _rcnn_batch(cfg, np.random.RandomState(0))
    rng = jax.random.key(5)

    monkeypatch.setenv("INSTSEG_ROI_BACKEND", "separable")
    _, m_ref = jax.jit(make_mask_rcnn_train_step(model, tx, cfg))(
        state, batch, rng)
    monkeypatch.setenv("INSTSEG_ROI_BACKEND", "sorted")
    # force BOTH call sites (box 7x7 AND mask 14x14) through the kernel —
    # the production threshold routes small-R calls to separable
    monkeypatch.setenv("INSTSEG_ROI_SORTED_MIN_R", "1")
    _, m_srt = jax.jit(make_mask_rcnn_train_step(model, tx, cfg))(
        state, batch, rng)
    # kernel computes in bf16 (the TPU mixed-precision contract); the f32
    # separable reference agrees to bf16 tolerance
    for k in m_ref:
        assert float(m_srt[k]) == pytest.approx(float(m_ref[k]), rel=0.05,
                                                abs=0.02), k


def test_sorted_backend_infer_equivalent(monkeypatch):
    from instancesegmentation_tpu.models.mask_rcnn.meta import \
        make_mask_rcnn_infer_fn
    cfg, model, state, _ = _rcnn_setup()
    batch = _rcnn_batch(cfg, np.random.RandomState(1))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    monkeypatch.setenv("INSTSEG_ROI_BACKEND", "separable")
    d_ref, p_ref = jax.jit(make_mask_rcnn_infer_fn(model, cfg, max_det=20))(
        variables, batch["image"])
    monkeypatch.setenv("INSTSEG_ROI_BACKEND", "sorted")
    monkeypatch.setenv("INSTSEG_ROI_SORTED_MIN_R", "1")
    d_srt, p_srt = jax.jit(make_mask_rcnn_infer_fn(model, cfg, max_det=20))(
        variables, batch["image"])

    nv_ref = np.asarray(d_ref.valid)
    nv_srt = np.asarray(d_srt.valid)
    np.testing.assert_array_equal(nv_ref.sum(1), nv_srt.sum(1))
    # detection ORDER can differ on bf16-level score ties — compare as a
    # matched set, and check each matched pair's mask probs agree (which
    # also validates the slot->detection un-permutation)
    for bi in range(2):
        b_ref = np.asarray(d_ref.boxes)[bi][nv_ref[bi]]
        l_ref = np.asarray(d_ref.labels)[bi][nv_ref[bi]]
        m_ref = np.asarray(p_ref)[bi][nv_ref[bi]]
        b_srt = np.asarray(d_srt.boxes)[bi][nv_srt[bi]]
        l_srt = np.asarray(d_srt.labels)[bi][nv_srt[bi]]
        m_srt = np.asarray(p_srt)[bi][nv_srt[bi]]
        used = set()
        for j in range(len(b_ref)):
            dists = np.abs(b_srt - b_ref[j]).max(axis=1)
            dists[l_srt != l_ref[j]] = 1e9
            for u in used:
                dists[u] = 1e9
            k = int(np.argmin(dists))
            assert dists[k] < 0.5, (bi, j, dists[k])
            used.add(k)
            np.testing.assert_allclose(m_srt[k], m_ref[j], atol=0.05,
                                       rtol=0.1)
