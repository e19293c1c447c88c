import numpy as np

from instancesegmentation_tpu.ops import anchors as anchor_ops


def test_yolact_feature_sizes_544():
    fh, fw = anchor_ops.yolact_feature_sizes(544, 544)
    assert fh.tolist() == [68, 34, 17, 9, 5]
    assert fw.tolist() == [68, 34, 17, 9, 5]


def test_yolact_feature_sizes_550():
    fh, fw = anchor_ops.yolact_feature_sizes(550, 550)
    # reference comment: 550 input -> 19248 anchors => sizes 69,35,18,9,5
    assert (np.asarray(fh) * np.asarray(fw) * 3).sum() == 19248


def test_yolact_anchor_count_544():
    a = anchor_ops.yolact_anchors((544, 544))
    assert a.shape == (18525, 4)  # nets/yolact.py:183 comment for 544


def test_yolact_anchor_reference_ordering_and_values():
    """First anchors replicate make_anchors (anchors.py:7-20) exactly."""
    a = anchor_ops.yolact_anchors((544, 544), (24, 48, 96, 192, 384))
    # cell (j=0, i=0) of level 0 (68x68, scale 24):
    np.testing.assert_allclose(a[0], [0.5 / 68, 0.5 / 68, 24 / 544, 24 / 544], rtol=1e-6)
    sq = np.sqrt(0.5)
    np.testing.assert_allclose(a[1], [0.5 / 68, 0.5 / 68, 24 * sq / 544, 24 / sq / 544], rtol=1e-6)
    np.testing.assert_allclose(a[2], [0.5 / 68, 0.5 / 68, 24 * np.sqrt(2) / 544, 24 / np.sqrt(2) / 544], rtol=1e-6)
    # second cell advances x by 1/68 (i fastest within a row)
    np.testing.assert_allclose(a[3, 0], 1.5 / 68, rtol=1e-6)
    np.testing.assert_allclose(a[3, 1], 0.5 / 68, rtol=1e-6)
    # level 1 starts after 68*68*3 anchors, centered at 0.5/34
    ofs = 68 * 68 * 3
    np.testing.assert_allclose(a[ofs], [0.5 / 34, 0.5 / 34, 48 / 544, 48 / 544], rtol=1e-6)


def test_rcnn_cell_anchors_rounding():
    base = anchor_ops._cell_anchors((32,), (0.5, 1.0, 2.0))
    # ratio .5: w = 32/sqrt(.5)=45.25 -> /2=22.6 -> round 23 (torch round-half-even)
    np.testing.assert_allclose(base[0], [-23.0, -11.0, 23.0, 11.0])
    np.testing.assert_allclose(base[1], [-16.0, -16.0, 16.0, 16.0])
    np.testing.assert_allclose(base[2], [-11.0, -23.0, 11.0, 23.0])


def test_rcnn_grid_anchors_shape_and_stride():
    fs = anchor_ops.fpn_feature_sizes((544, 544))
    assert fs == ((136, 136), (68, 68), (34, 34), (17, 17), (9, 9))
    a = anchor_ops.rcnn_grid_anchors(fs, (544, 544))
    expect = sum(h * w * 3 for h, w in fs)
    assert a.shape == (expect, 4)
    # first anchor of level 0 is the 32-size ratio-.5 box at shift (0,0)
    np.testing.assert_allclose(a[0], [-23.0, -11.0, 23.0, 11.0])
    # next cell shifts x by stride 4
    np.testing.assert_allclose(a[3], [-19.0, -11.0, 27.0, 11.0])
