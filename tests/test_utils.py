import numpy as np
import pytest


def test_torch_weight_conversion_roundtrip():
    """Fake torchvision-style resnet50 state_dict -> flax tree; forward
    values must match torch's conv/bn arithmetic on a probe tensor."""
    import jax
    import jax.numpy as jnp
    from instancesegmentation_tpu.models.resnet import ResNet
    from instancesegmentation_tpu.utils.torch_weights import (
        convert_resnet50_state_dict, merge_backbone_params)

    model = ResNet(layers=(3, 4, 6, 3), out_stages=(2, 3, 4),
                   dtype=jnp.float32)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    # synthesize a torch state dict with the right shapes from the flax tree
    rng = np.random.RandomState(0)
    sd = {}
    p = variables["params"]
    s = variables["batch_stats"]
    k1 = np.asarray(p["conv1"]["kernel"])
    sd["conv1.weight"] = (rng.randn(k1.shape[3], k1.shape[2],
                                    k1.shape[0], k1.shape[1]) * 0.05).astype(np.float32)
    for nm in ("weight", "bias", "running_mean", "running_var"):
        base = np.asarray(p["bn1"]["scale"])
        arr = rng.rand(*base.shape).astype(np.float32) + 0.5
        sd[f"bn1.{nm}"] = arr
    blocks = (3, 4, 6, 3)
    for li, n in enumerate(blocks, 1):
        for bi in range(n):
            blk = p[f"layer{li}_{bi}"]
            for ci in (1, 2, 3):
                k = np.asarray(blk[f"conv{ci}"]["kernel"])
                sd[f"layer{li}.{bi}.conv{ci}.weight"] = (rng.randn(
                    k.shape[3], k.shape[2], k.shape[0], k.shape[1]
                ) * 0.05).astype(np.float32)
                for nm in ("weight", "bias", "running_mean", "running_var"):
                    c = np.asarray(blk[f"bn{ci}"]["scale"])
                    sd[f"layer{li}.{bi}.bn{ci}.{nm}"] = (
                        rng.rand(*c.shape).astype(np.float32) + 0.5)
            if "down_conv" in blk:
                k = np.asarray(blk["down_conv"]["kernel"])
                sd[f"layer{li}.{bi}.downsample.0.weight"] = (rng.randn(
                    k.shape[3], k.shape[2], k.shape[0], k.shape[1]
                ) * 0.05).astype(np.float32)
                for nm in ("weight", "bias", "running_mean", "running_var"):
                    c = np.asarray(blk["down_bn"]["scale"])
                    sd[f"layer{li}.{bi}.downsample.1.{nm}"] = (
                        rng.rand(*c.shape).astype(np.float32) + 0.5)

    bp, bs = convert_resnet50_state_dict(sd)
    wrapped_p, wrapped_s = {"backbone": p}, {"backbone": s}
    new_p, new_s = merge_backbone_params(wrapped_p, bp, wrapped_s, bs)

    # every kernel/bn leaf replaced (same shapes everywhere here)
    np.testing.assert_allclose(
        np.asarray(new_p["backbone"]["conv1"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(new_s["backbone"]["layer3_2"]["bn2"]["var"]),
        sd["layer3.2.bn2.running_var"])
    # model still runs with converted weights
    out = model.apply({"params": new_p["backbone"],
                       "batch_stats": new_s["backbone"]},
                      np.ones((1, 64, 64, 3), np.float32), train=False)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out)


def test_initializer_zoo():
    import jax
    from instancesegmentation_tpu.utils.initializers import (
        get_initializer, reinit_conv_kernels)
    for t in ("normal", "xavier", "kaiming", "orthogonal"):
        init = get_initializer(t)
        w = init(jax.random.key(0), (3, 3, 8, 16), np.float32)
        assert w.shape == (3, 3, 8, 16)
    with pytest.raises(NotImplementedError):
        get_initializer("bogus")

    params = {"a": {"kernel": np.zeros((3, 3, 4, 8), np.float32),
                    "bias": np.zeros((8,), np.float32)}}
    out = reinit_conv_kernels(params, jax.random.key(1), "kaiming")
    assert float(np.abs(np.asarray(out["a"]["kernel"])).sum()) > 0
    assert float(np.abs(np.asarray(out["a"]["bias"])).sum()) == 0


def test_grouped_batch_sampler():
    from instancesegmentation_tpu.data.aspect_ratio import GroupedBatchSampler
    group_ids = [0] * 10 + [1] * 7
    s = GroupedBatchSampler(group_ids, batch_size=4, seed=0)
    batches = s.epoch(0)
    assert len(batches) == len(s) == 5
    for b in batches:
        assert len(b) == 4
        gs = {group_ids[i] for i in b}
        assert len(gs) == 1            # one group per batch
    # every real index appears at least once
    seen = {i for b in batches for i in b}
    assert seen == set(range(17))


def test_model_summary(tmp_path):
    import jax.numpy as jnp
    from instancesegmentation_tpu.models.resnet import ResNet
    from instancesegmentation_tpu.utils.summary import write_info
    model = ResNet(layers=(1, 1, 1, 1), out_stages=(4,), dtype=jnp.float32)
    path = write_info(model, np.zeros((1, 32, 32, 3), np.float32),
                      str(tmp_path))
    text = open(path).read()
    assert "Total params:" in text


def test_maskrcnn_weight_conversion():
    """Full torchvision maskrcnn_resnet50_fpn state_dict -> MaskRCNN tree.
    The layout-sensitive pieces are verified NUMERICALLY against torch:
    fc6 consumes a CHW flatten in torch but an HWC flatten here, and
    flax's ConvTranspose needs the spatially-flipped torch kernel."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.utils.torch_weights import (
        _deconv, _dense_from_nhwc_flatten, convert_maskrcnn_state_dict,
        merge_params)

    rng = np.random.RandomState(1)

    # --- fc6 flatten-order equivalence --------------------------------
    c, hh, ww, out = 8, 7, 7, 16
    w = rng.randn(out, c * hh * ww).astype(np.float32) * 0.1
    x_hwc = rng.randn(hh, ww, c).astype(np.float32)
    y_torch = F.linear(torch.from_numpy(
        x_hwc.transpose(2, 0, 1).reshape(-1)), torch.from_numpy(w)).numpy()
    y_flax = x_hwc.reshape(-1) @ _dense_from_nhwc_flatten(w, c, hh, ww)
    np.testing.assert_allclose(y_flax, y_torch, rtol=1e-5, atol=1e-5)

    # --- ConvTranspose2d equivalence -----------------------------------
    import flax.linen as nn
    cin, cout = 4, 6
    wt = rng.randn(cin, cout, 2, 2).astype(np.float32) * 0.1
    x = rng.randn(1, 5, 5, cin).astype(np.float32)
    y_torch = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(wt),
        stride=2).numpy().transpose(0, 2, 3, 1)
    mod = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), use_bias=False)
    y_flax = mod.apply({"params": {"kernel": jnp.asarray(_deconv(wt))}}, x)
    np.testing.assert_allclose(np.asarray(y_flax), y_torch,
                               rtol=1e-4, atol=1e-5)

    # --- full-tree conversion + merge -----------------------------------
    cfg = get_config("mask_rcnn_base", input_shape=(64, 64),
                     mixed_precision=False)
    model = get_model(cfg, train_mode=False)
    variables = model.init({"params": jax.random.key(0)},
                           np.zeros((1, 64, 64, 3), np.float32), train=False)
    p, s = variables["params"], variables["batch_stats"]

    sd = {}
    def put_conv(src, kernel, bias=True):
        k = np.asarray(kernel)
        sd[src + ".weight"] = (rng.randn(
            k.shape[3], k.shape[2], k.shape[0], k.shape[1]) * 0.03).astype(np.float32)
        if bias:
            sd[src + ".bias"] = (rng.randn(k.shape[3]) * 0.03).astype(np.float32)
    # resnet body (same synthesizer as the roundtrip test)
    sd["conv1.weight"] = (rng.randn(64, 3, 7, 7) * 0.03).astype(np.float32)
    for nm in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{nm}"] = rng.rand(64).astype(np.float32) + 0.5
    for li, n in enumerate((3, 4, 6, 3), 1):
        for bi in range(n):
            blk = p["backbone"][f"layer{li}_{bi}"]
            for ci in (1, 2, 3):
                k = np.asarray(blk[f"conv{ci}"]["kernel"])
                sd[f"layer{li}.{bi}.conv{ci}.weight"] = (rng.randn(
                    k.shape[3], k.shape[2], k.shape[0], k.shape[1]) * 0.03).astype(np.float32)
                for nm in ("weight", "bias", "running_mean", "running_var"):
                    cdim = np.asarray(blk[f"bn{ci}"]["scale"]).shape
                    sd[f"layer{li}.{bi}.bn{ci}.{nm}"] = rng.rand(*cdim).astype(np.float32) + 0.5
            if "down_conv" in blk:
                k = np.asarray(blk["down_conv"]["kernel"])
                sd[f"layer{li}.{bi}.downsample.0.weight"] = (rng.randn(
                    k.shape[3], k.shape[2], k.shape[0], k.shape[1]) * 0.03).astype(np.float32)
                for nm in ("weight", "bias", "running_mean", "running_var"):
                    cdim = np.asarray(blk["down_bn"]["scale"]).shape
                    sd[f"layer{li}.{bi}.downsample.1.{nm}"] = rng.rand(*cdim).astype(np.float32) + 0.5
    sd = {"backbone.body." + k: v for k, v in sd.items()}
    # fpn + rpn + heads
    for i in range(4):
        put_conv(f"backbone.fpn.inner_blocks.{i}", p["fpn"][f"inner{i}"]["kernel"])
        put_conv(f"backbone.fpn.layer_blocks.{i}", p["fpn"][f"layer{i}"]["kernel"])
    put_conv("rpn.head.conv", p["rpn_head"]["conv"]["kernel"])
    put_conv("rpn.head.cls_logits", p["rpn_head"]["cls_logits"]["kernel"])
    put_conv("rpn.head.bbox_pred", p["rpn_head"]["bbox_pred"]["kernel"])
    sd["roi_heads.box_head.fc6.weight"] = rng.randn(1024, 256 * 49).astype(np.float32) * 0.01
    sd["roi_heads.box_head.fc6.bias"] = rng.randn(1024).astype(np.float32)
    sd["roi_heads.box_head.fc7.weight"] = rng.randn(1024, 1024).astype(np.float32) * 0.01
    sd["roi_heads.box_head.fc7.bias"] = rng.randn(1024).astype(np.float32)
    for i in range(1, 5):
        put_conv(f"roi_heads.mask_head.mask_fcn{i}",
                 p["mask_head"][f"mask_fcn{i}"]["kernel"])
    sd["roi_heads.mask_predictor.conv5_mask.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32) * 0.01
    sd["roi_heads.mask_predictor.conv5_mask.bias"] = rng.randn(256).astype(np.float32)
    # COCO-class predictor heads: present in the .pth, dropped on load
    sd["roi_heads.box_predictor.cls_score.weight"] = rng.randn(91, 1024).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.bias"] = rng.randn(91).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = rng.randn(364, 1024).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = rng.randn(364).astype(np.float32)
    sd["roi_heads.mask_predictor.mask_fcn_logits.weight"] = rng.randn(91, 256, 1, 1).astype(np.float32)
    sd["roi_heads.mask_predictor.mask_fcn_logits.bias"] = rng.randn(91).astype(np.float32)

    cp, cs = convert_maskrcnn_state_dict(sd)
    new_p = merge_params(p, cp)
    new_s = merge_params(s, cs)

    # every converted leaf replaced; predictor heads untouched
    np.testing.assert_allclose(
        np.asarray(new_p["fpn"]["inner2"]["kernel"]),
        np.transpose(sd["backbone.fpn.inner_blocks.2.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(np.asarray(new_p["box_head"]["fc7"]["kernel"]),
                               sd["roi_heads.box_head.fc7.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(new_p["box_predictor"]["cls_score"]["kernel"]),
        np.asarray(p["box_predictor"]["cls_score"]["kernel"]))
    # model applies finitely with merged weights
    out = model.apply({"params": new_p, "batch_stats": new_s},
                      np.ones((1, 64, 64, 3), np.float32), train=False)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(out))


def test_pin_to_device_preserves_values():
    """pin_to_device must be a value-identity for every dtype used in
    checkpoints (f32/bf16/int/bool) while producing fresh buffers."""
    import jax
    import jax.numpy as jnp
    from instancesegmentation_tpu.utils.device import pin_to_device

    rng = np.random.RandomState(0)
    tree = {
        "w": rng.randn(4, 3).astype(np.float32),
        "h": jnp.asarray(rng.randn(2, 2), jnp.bfloat16),
        "step": np.int32(7),
        "mask": np.array([True, False, True]),
    }
    out = pin_to_device(tree)
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
    np.testing.assert_array_equal(np.asarray(out["h"], np.float32),
                                  np.asarray(tree["h"], np.float32))
    assert int(out["step"]) == 7
    np.testing.assert_array_equal(np.asarray(out["mask"]), tree["mask"])
    assert all(isinstance(v, jax.Array) for v in jax.tree.leaves(out))


def test_remat_backbone_identical():
    """cfg.remat_backbone is a pure memory mode: the variable tree and
    forward value must be IDENTICAL to the non-remat backbone, and the
    BN-stat updates / gradients equal to float round-off (the recomputed
    forward fuses differently, so reassociation shifts the last ulps —
    measured <=3e-6 relative on this graph)."""
    import jax
    import jax.numpy as jnp
    from instancesegmentation_tpu.models.resnet import ResNet

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)

    def build(remat):
        m = ResNet(layers=(1, 1, 1, 1), out_stages=(2, 4),
                   dtype=jnp.float32, remat=remat)
        v = m.init({"params": jax.random.key(0)}, x, train=False)
        return m, v

    m0, v0 = build(False)
    m1, v1 = build(True)
    # same variable tree (remat keeps module scopes)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss_fn(m, v):
        def f(params):
            outs, mut = m.apply({"params": params,
                                 "batch_stats": v["batch_stats"]},
                                x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o * o) for o in outs), mut
        (val, mut), grads = jax.value_and_grad(f, has_aux=True)(v["params"])
        return val, mut, grads

    val0, mut0, g0 = jax.jit(lambda v: loss_fn(m0, v))(v0)
    val1, mut1, g1 = jax.jit(lambda v: loss_fn(m1, v))(v1)
    np.testing.assert_allclose(float(val0), float(val1), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves((mut0, g0)),
                    jax.tree_util.tree_leaves((mut1, g1))):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(a)) + 1e-30
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)


def test_host_feed_only_env_gate(monkeypatch):
    """host_feed_only keys on the axon relay env (the only backend where
    device_put buffers stay host-backed — utils/device.py docstring);
    everywhere else the trainer keeps the staged async-H2D path."""
    from instancesegmentation_tpu.utils.device import host_feed_only
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert not host_feed_only()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not host_feed_only()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert host_feed_only()
