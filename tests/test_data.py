import numpy as np
import pytest

from instancesegmentation_tpu.data import rle
from instancesegmentation_tpu.data.augment import Augmentation, BaseTransform, normalize_image
from instancesegmentation_tpu.data.coco import COCO, get_coco_label_map
from instancesegmentation_tpu.data.datasets import (SHAPE_CLASSES, SegDataset,
                                                    synthetic_annotation)
from instancesegmentation_tpu.data.loader import Loader, YolactCollate


# ---------------------------------------------------------------- RLE codec

def test_rle_roundtrip_random(rng):
    for _ in range(10):
        h, w = rng.randint(5, 60), rng.randint(5, 60)
        mask = (rng.rand(h, w) > 0.6).astype(np.uint8)
        enc = rle.encode(mask)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(dec, mask)
        assert rle.area(enc) == mask.sum()


def test_rle_known_value():
    # 3x3, column-major runs: col0=[1,1,0], col1=[0,1,0], col2=[0,0,1]
    mask = np.array([[1, 0, 0], [1, 1, 0], [0, 0, 1]], np.uint8)
    enc = rle.encode(mask)
    counts = rle.string_to_counts(enc["counts"])
    # flat F-order: 1,1,0, 0,1,0, 0,0,1 -> runs: 0x0,2x1,2x0,1x1,3x0,1x1
    assert counts == [0, 2, 2, 1, 3, 1]
    np.testing.assert_array_equal(rle.decode(enc), mask)


def test_rle_empty_and_full():
    z = np.zeros((4, 7), np.uint8)
    f = np.ones((4, 7), np.uint8)
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    np.testing.assert_array_equal(rle.decode(rle.encode(f)), f)
    assert rle.area(rle.encode(f)) == 28


def test_rle_uncompressed_counts():
    dec = rle.decode({"size": [2, 2], "counts": [1, 2, 1]})
    np.testing.assert_array_equal(dec, np.array([[0, 1], [1, 0]]))


def test_rle_iou():
    a = rle.encode(np.array([[1, 1], [0, 0]], np.uint8))
    b = rle.encode(np.array([[1, 0], [1, 0]], np.uint8))
    out = rle.iou_rle([a], [b], [0])
    np.testing.assert_allclose(out, [[1 / 3]])
    crowd = rle.iou_rle([a], [b], [1])   # inter / area(dt) = 1/2
    np.testing.assert_allclose(crowd, [[0.5]])


def test_rle_iou_native_matches_dense(rng, monkeypatch):
    """The O(runs) native rle_iou (native/rle.cc) must be bit-exact vs the
    dense-decode numpy fallback (the golden reference), incl. crowd
    semantics and empty/full masks."""
    if rle._load_native() is None or not hasattr(rle._load_native(), "rle_iou"):
        import pytest
        pytest.skip("librle.so without rle_iou (run make -C native)")

    H, W = 61, 47   # odd sizes: exercise column-major runs that wrap rows
    def rand_mask():
        m = np.zeros((H, W), np.uint8)
        for _ in range(int(rng.randint(0, 4))):
            y, x = int(rng.randint(0, H)), int(rng.randint(0, W))
            h, w = int(rng.randint(1, 30)), int(rng.randint(1, 30))
            m[y:y + h, x:x + w] = 1
        return m

    dts = [rle.encode(rand_mask()) for _ in range(7)]
    gts = ([rle.encode(rand_mask()) for _ in range(4)]
           + [rle.encode(np.zeros((H, W), np.uint8)),
              rle.encode(np.ones((H, W), np.uint8))])
    crowd = [0, 1, 0, 1, 0, 1]

    native = rle.iou_rle(dts, gts, crowd)
    monkeypatch.setattr(rle, "_load_native", lambda: None)
    dense = rle.iou_rle(dts, gts, crowd)
    np.testing.assert_allclose(native, dense, rtol=0, atol=0)
    assert native.shape == (7, 6)


def test_polygons_to_mask():
    m = rle.polygons_to_mask([[1, 1, 6, 1, 6, 6, 1, 6]], 8, 8)
    assert m[3, 3] == 1 and m[0, 0] == 0
    assert m.sum() >= 25


# ---------------------------------------------------------------- COCO API

def _tiny_coco():
    return COCO({
        "images": [{"id": 1, "height": 4, "width": 4, "file_name": "a.png"},
                   {"id": 2, "height": 4, "width": 4, "file_name": "b.png"}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 2, 2], "area": 4, "iscrowd": 0,
             "segmentation": {"size": [4, 4], "counts": [0, 2, 2, 2, 10]}},
            {"id": 11, "image_id": 1, "category_id": 2, "bbox": [2, 2, 2, 2],
             "area": 4, "iscrowd": 1,
             "segmentation": {"size": [4, 4], "counts": [10, 2, 2, 2]}},
        ],
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    })


def test_coco_index_queries():
    c = _tiny_coco()
    assert c.getImgIds() == [1, 2]
    assert c.getAnnIds(imgIds=1) == [10, 11]
    assert c.getAnnIds(imgIds=1, iscrowd=True) == [11]
    assert c.getCatIds() == [1, 2]
    assert c.loadImgs(2)[0]["file_name"] == "b.png"
    mask = c.annToMask(c.loadAnns(10)[0])
    assert mask.shape == (4, 4) and mask.sum() == 4


def test_label_map():
    c = _tiny_coco()
    lm = get_coco_label_map(c, ["dog", "cat"])
    assert lm == {2: 1, 1: 2}


# ------------------------------------------------------- synthetic dataset

@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return synthetic_annotation(str(root), num_images=6, image_size=128)


def test_synthetic_dataset_raw(synth):
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map)
    assert len(ds) == 6
    s = ds.raw_item(0)
    assert s["image"].shape == (128, 128, 3)
    n = len(s["labels"])
    assert 1 <= n <= 4
    assert s["masks"].shape == (n, 128, 128)
    assert np.all(s["boxes"] >= 0) and np.all(s["boxes"] <= 1)
    assert np.all(s["labels"] >= 0) and np.all(s["labels"] < len(SHAPE_CLASSES))
    # boxes tight around masks
    ys, xs = np.nonzero(s["masks"][0])
    np.testing.assert_allclose(s["boxes"][0],
                               [xs.min() / 128, ys.min() / 128,
                                (xs.max() + 1) / 128, (ys.max() + 1) / 128],
                               atol=1e-6)


def test_augmentation_keeps_invariants(synth):
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map,
                    transform=Augmentation((96, 96)))
    for i in range(4):
        s = ds.get_item(i, np.random.default_rng(i))
        assert s["image"].shape == (96, 96, 3)
        n = len(s["labels"])
        assert n >= 1
        assert s["masks"].shape == (n, 96, 96)
        assert s["boxes"].shape == (n, 4)
        assert np.all(s["boxes"][:, 2:] >= s["boxes"][:, :2] - 1e-5)
        assert np.all(s["boxes"] >= -1e-5) and np.all(s["boxes"] <= 1 + 1e-5)


def test_base_transform_deterministic(synth):
    ds = SegDataset(synth.val_image_path, synth.val_coco, synth.label_map,
                    transform=BaseTransform((96, 96)))
    a = ds.get_item(0, np.random.default_rng(0))
    b = ds.get_item(0, np.random.default_rng(99))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])


def test_loader_batches(synth):
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map,
                    transform=BaseTransform((96, 96)))
    loader = Loader(ds, batch_size=3, collate=YolactCollate(8, (24, 24)),
                    num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (3, 96, 96, 3)
    assert b["boxes"].shape == (3, 8, 4)
    assert b["masks"].shape == (3, 8, 24, 24)
    assert b["valid"].dtype == bool and b["valid"].any()
    # padded slots all-zero
    assert np.all(b["boxes"][~b["valid"]] == 0)
    # raw uint8 at the H2D boundary; normalization happens on device
    # (ops/preprocess.py)
    assert b["image"].dtype == np.uint8


def test_dataset_image_cache_bit_exact(synth):
    """cache_images=True must return the same pixels on every epoch as
    the uncached decode path (round-5 host-pipeline lever)."""
    plain = SegDataset(synth.train_image_path, synth.train_coco,
                       synth.label_map)
    cached = SegDataset(synth.train_image_path, synth.train_coco,
                        synth.label_map, cache_images=True)
    iid = plain.ids[0]
    a = plain.load_image(iid)
    b1 = cached.load_image(iid)          # decode + populate
    b2 = cached.load_image(iid)          # cache hit
    assert cached._image_cache and iid in cached._image_cache
    np.testing.assert_array_equal(a, b1)
    np.testing.assert_array_equal(a, b2)
    assert b1.dtype == np.float32


def test_loader_process_shards_concat_to_global(synth):
    """num_shards/shard_index (the DistributedSampler analogue,
    models/init_model.py:88-92): each shard decodes only its contiguous
    rows, shards are disjoint, and the rank-order concatenation is
    BIT-EXACT the unsharded loader's global batch (the property
    parallel.mesh.shard_batch relies on to assemble the global array)."""
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map,
                    transform=BaseTransform((96, 96)))
    collate = YolactCollate(8, (24, 24))
    mk = lambda **kw: Loader(ds, batch_size=4, collate=collate,
                             num_workers=1, seed=11, **kw)
    global_batches = list(mk().epoch(3))
    shard_batches = [list(mk(num_shards=2, shard_index=r).epoch(3))
                     for r in range(2)]
    assert len(shard_batches[0]) == len(shard_batches[1]) == len(global_batches)
    for g, b0, b1 in zip(global_batches, *shard_batches):
        assert b0["image"].shape[0] == b1["image"].shape[0] == 2
        # disjoint cover
        assert not set(b0["image_id"]) & set(b1["image_id"])
        for k in g:
            np.testing.assert_array_equal(
                np.concatenate([b0[k], b1[k]]), g[k], err_msg=k)
    # a non-divisible global batch fails at construction (a silent
    # all-batches-skipped epoch would otherwise report loss 0.0)
    with pytest.raises(ValueError, match="divide"):
        Loader(ds, batch_size=3, collate=collate, num_workers=1,
               num_shards=2, shard_index=0)
    # sampler-provided ragged batches (batch_sampler path) are still
    # skipped per-batch (SPMD equal-shape rule)
    class OddSampler:
        def epoch(self, e):
            return [list(range(3)), list(range(4))]
    odd = Loader(ds, batch_size=4, collate=collate, num_workers=1,
                 batch_sampler=OddSampler(), num_shards=2, shard_index=0)
    assert len(list(odd.epoch(0))) == 1      # only the even batch survives


def test_loader_survives_shared_pool_growth(synth):
    """A Loader mid-epoch must survive another loader growing the shared
    worker pool (the swap shuts the old executor down for NEW submits;
    the producer re-fetches and resubmits — review finding round 4)."""
    from instancesegmentation_tpu.data import loader as loader_mod
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map,
                    transform=BaseTransform((96, 96)))
    loader = Loader(ds, batch_size=1, collate=YolactCollate(8, (24, 24)),
                    num_workers=2, prefetch=1)
    it = loader.epoch(0)
    first = next(it)                       # producer is live, holding a pool
    # simulate a second Loader requesting a bigger pool mid-epoch
    loader_mod._shared_pool(loader_mod._POOL_SIZE + 2)
    rest = list(it)                        # must not raise
    assert len(rest) == len(loader) - 1
    assert first["image"].shape[0] == 1


def test_loader_shuffles_between_epochs(synth):
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map,
                    transform=BaseTransform((96, 96)))
    loader = Loader(ds, batch_size=3, collate=YolactCollate(8, (24, 24)),
                    num_workers=1)
    ids0 = np.concatenate([b["image_id"] for b in loader.epoch(0)])
    ids1 = np.concatenate([b["image_id"] for b in loader.epoch(1)])
    assert set(ids0) == set(ids1)
    assert not np.array_equal(ids0, ids1)


def test_loader_with_grouped_sampler(synth):
    from instancesegmentation_tpu.data.aspect_ratio import (
        GroupedBatchSampler, create_aspect_ratio_groups)
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map,
                    transform=BaseTransform((96, 96)))
    groups = create_aspect_ratio_groups(ds, 0)
    sampler = GroupedBatchSampler(groups, batch_size=3)
    loader = Loader(ds, 3, YolactCollate(8, (24, 24)), num_workers=1,
                    batch_sampler=sampler)
    batches = list(loader.epoch(0))
    assert len(batches) == len(sampler)
    assert batches[0]["image"].shape == (3, 96, 96, 3)


def test_pad_and_resize_scale_extras():
    from instancesegmentation_tpu.data.augment import pad_to, resize_scale
    img = np.ones((10, 12, 3), np.float32) * 7
    masks = np.ones((2, 10, 12), np.uint8)
    canvas, mcanvas = pad_to(img, masks, (16, 20))
    assert canvas.shape == (16, 20, 3) and mcanvas.shape == (2, 16, 20)
    assert canvas[0, 0, 0] == 7 and canvas[-1, -1, 0] == 128
    assert mcanvas[:, :10, :12].all() and not mcanvas[:, 10:, :].any()
    boxes = np.array([[0.0, 0.0, 12.0, 10.0]], np.float32)
    img2, masks2, boxes2 = resize_scale(img, masks, boxes, 0.5)
    assert img2.shape == (5, 6, 3)
    np.testing.assert_allclose(boxes2[0], [0, 0, 6, 5])


def test_normalize_image_stats():
    img = np.full((4, 4, 3), 123.68, np.float32)
    out = normalize_image(img)
    assert abs(out[..., 0]).max() < 1e-5


def test_normalize_on_device_matches_host():
    """The on-device normalize (ops/preprocess.py) must reproduce the host
    path it replaced: yolact mean/std, the R-CNN fused double-normalize,
    and float passthrough for already-normalized inputs."""
    import jax.numpy as jnp

    from instancesegmentation_tpu.ops.preprocess import (IMAGENET_MEAN,
                                                         IMAGENET_STD,
                                                         normalize_on_device)
    rs = np.random.RandomState(3)
    img = rs.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)

    dev = np.asarray(normalize_on_device(jnp.asarray(img), "yolact"))
    host = normalize_image(img.astype(np.float32))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)

    dev2 = np.asarray(normalize_on_device(jnp.asarray(img), "mask_rcnn"))
    host2 = (normalize_image(img.astype(np.float32))
             - IMAGENET_MEAN) / IMAGENET_STD       # sequential double norm
    np.testing.assert_allclose(dev2, host2, rtol=1e-5, atol=1e-5)

    # float input = already normalized on host -> unchanged
    f = host.astype(np.float32)
    out = np.asarray(normalize_on_device(jnp.asarray(f), "yolact"))
    np.testing.assert_array_equal(out, f)


def test_quantize_uint8_bound():
    """Round+clip quantization at the H2D boundary: error <= 0.5 LSB for
    in-range pixels (<= 0.9% of one normalized std), clipping only at the
    augmentation tails."""
    from instancesegmentation_tpu.data.loader import quantize_uint8
    f = np.array([[-7.3, 0.2, 128.5001, 254.9, 270.0]], np.float32)
    q = quantize_uint8(np.repeat(f[..., None], 3, -1))
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q[0, :, 0], [0, 0, 129, 255, 255])
    inr = np.linspace(0, 255, 1001, dtype=np.float32)
    err = np.abs(quantize_uint8(
        np.tile(inr[None, :, None], (1, 1, 3))).astype(np.float32)[0, :, 0]
        - inr)
    assert err.max() <= 0.5 + 1e-6
    # uint8 input passes through untouched
    u = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert quantize_uint8(u) is u


def test_resize_keep_aspect():
    from instancesegmentation_tpu.data.augment import resize_keep_aspect
    img = np.full((100, 50, 3), 7.0, np.float32)          # tall 2:1
    masks = np.ones((1, 100, 50), np.uint8)
    boxes = np.array([[10.0, 20.0, 40.0, 80.0]], np.float32)
    out, m, b = resize_keep_aspect(img, masks, boxes, (64, 64))
    assert out.shape == (64, 64, 3) and m.shape == (1, 64, 64)
    # scale = 64/100 = 0.64 -> content 64x32, right half gray pad
    assert (out[:, :32] == 7.0).all() and (out[:, 32:] == 128.0).all()
    assert m[0, :, :32].all() and not m[0, :, 32:].any()
    np.testing.assert_allclose(b[0], [6.4, 12.8, 25.6, 51.2], atol=1e-5)


def test_bucket_batch_sampler_and_loader(synth):
    from instancesegmentation_tpu.data.aspect_ratio import BucketBatchSampler
    from instancesegmentation_tpu.data.loader import RcnnCollate
    buckets = ((64, 128), (96, 96), (128, 64))
    ds = SegDataset(synth.train_image_path, synth.train_coco, synth.label_map,
                    transform=BaseTransform((96, 96), keep_aspect=True))
    sampler = BucketBatchSampler(ds, buckets, batch_size=2)
    batches = sampler.epoch(0)
    assert len(batches) == len(sampler)
    for hw, idxs in batches:
        assert hw in buckets and len(idxs) == 2
    # square synthetic images -> everything lands in the square bucket
    assert all(hw == (96, 96) for hw, _ in batches)

    loader = Loader(ds, 2, RcnnCollate(8), num_workers=1,
                    batch_sampler=sampler)
    batch = next(iter(loader.epoch(0)))
    assert batch["image"].shape == (2, 96, 96, 3)
    # image-res masks ship BIT-PACKED along width (8x H2D cut); the jitted
    # step unpacks on device
    assert batch["masks"].shape[-2:] == (96, 12)
    import jax.numpy as jnp

    from instancesegmentation_tpu.ops.preprocess import unpack_mask_bits
    unpacked = np.asarray(unpack_mask_bits(jnp.asarray(batch["masks"]), 96))
    assert unpacked.shape[-2:] == (96, 96)
    assert set(np.unique(unpacked)) <= {0, 1} and unpacked.any()


def test_mask_bit_pack_roundtrip():
    """pack_mask_bits (host) -> unpack_mask_bits (device) is exact for any
    width, including non-multiples of 8."""
    import jax.numpy as jnp

    from instancesegmentation_tpu.ops.preprocess import (pack_mask_bits,
                                                         unpack_mask_bits)
    rs = np.random.RandomState(7)
    for w in (8, 13, 96, 100):
        m = (rs.rand(2, 3, 5, w) > 0.5).astype(np.uint8)
        packed = pack_mask_bits(m)
        assert packed.shape == (2, 3, 5, -(-w // 8))
        out = np.asarray(unpack_mask_bits(jnp.asarray(packed), w))
        np.testing.assert_array_equal(out, m)
        # full-width input passes through untouched
        same = unpack_mask_bits(jnp.asarray(m), w)
        np.testing.assert_array_equal(np.asarray(same), m)


def test_bucket_assignment_nearest_ratio():
    from instancesegmentation_tpu.data.aspect_ratio import \
        assign_resolution_buckets

    class _FakeCoco:
        def loadImgs(self, i):
            return [{"width": [200, 100, 50][i], "height": 100}]

    class _FakeDs:
        ids = [0, 1, 2]
        coco = _FakeCoco()

    idx = assign_resolution_buckets(_FakeDs(), ((64, 128), (96, 96), (128, 64)))
    assert idx == [0, 1, 2]


def test_dataset_layouts_voc_coco_verseg(synth, tmp_path):
    """get_annotation's four on-disk layouts (annotation/voc.py:38-42,
    annotation/coco.py:35-44, annotation/verseg.py:33-39, synth shape):
    each must produce a working Annotation from the reference's directory
    shapes — previously only 'shape' was ever exercised."""
    import os
    import shutil

    from instancesegmentation_tpu.data.datasets import get_annotation

    src_root = os.path.dirname(os.path.dirname(synth.train_image_path))
    layouts = {
        "voc": (("VOC2007/JPEGImages", "VOC2007/Annotations/train.json"),
                ("VOC2012/JPEGImages", "VOC2012/Annotations/val.json")),
        "coco": (("train2017", "annotations/instances_train2017.json"),
                 ("val2014", "annotations/instances_val2014.json")),
        "verseg": (("Train/image", "Train/annotations.json"),
                   ("Validation/image", "Validation/annotations.json")),
    }
    for exp_name, ((ti, tj), (vi, vj)) in layouts.items():
        root = tmp_path / exp_name
        for split, img_dir, json_path in (("train", ti, tj), ("val", vi, vj)):
            dst_img = root / img_dir
            dst_img.parent.mkdir(parents=True, exist_ok=True)
            shutil.copytree(os.path.join(src_root, split, "images"), dst_img)
            dst_json = root / json_path
            dst_json.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy(os.path.join(src_root, split, "annotations.json"),
                        dst_json)
        ann = get_annotation(exp_name, str(root), list(SHAPE_CLASSES))
        assert ann.num_classes == len(SHAPE_CLASSES)
        assert len(ann.label_map) == len(SHAPE_CLASSES)
        assert len(ann.train_coco.getImgIds()) == 6
        ds = SegDataset(ann.train_image_path, ann.train_coco, ann.label_map,
                        transform=BaseTransform((96, 96)))
        batch = next(iter(Loader(ds, batch_size=2,
                                 collate=YolactCollate(8, (24, 24)),
                                 num_workers=1).epoch(0)))
        assert batch["image"].shape == (2, 96, 96, 3)
    with pytest.raises(ValueError):
        get_annotation("nope", str(tmp_path), list(SHAPE_CLASSES))
