"""Import torch ResNet50 pretrained weights into the flax backbone.

Capability parity with the reference's pretrained init
(/root/reference/models/init_model.py:40-41 resnet50.pth for Mask R-CNN;
inst_model/yolact/nets/yolact.py:131-133 resnet50_backbone_weights.pth for
YOLACT): given a torchvision-style ResNet50 ``state_dict`` (.pth), map it
onto ``instancesegmentation_tpu.models.resnet.ResNet`` params/batch_stats.

Conventions:
  torch conv weight (O, I, kh, kw)  ->  flax kernel (kh, kw, I, O)
  torch bn {weight, bias, running_mean, running_var}
      ->  flax {scale, bias} params + {mean, var} batch_stats
  torchvision names layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}
      ->  ours   layer{1..4}_{i}.conv{1..3}/bn{1..3}/down_{conv,bn}
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def convert_resnet50_state_dict(state_dict: Dict[str, "np.ndarray"]
                                ) -> Tuple[Dict, Dict]:
    """torch state_dict (tensors or arrays) -> (params, batch_stats) trees
    for models.resnet.ResNet(layers=(3,4,6,3))."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def put_bn(dst: str, src: str):
        params[dst] = {"scale": sd[src + ".weight"].astype(np.float32),
                       "bias": sd[src + ".bias"].astype(np.float32)}
        stats[dst] = {"mean": sd[src + ".running_mean"].astype(np.float32),
                      "var": sd[src + ".running_var"].astype(np.float32)}

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1")

    blocks = (3, 4, 6, 3)
    for li, n in enumerate(blocks, start=1):
        for bi in range(n):
            dst = f"layer{li}_{bi}"
            src = f"layer{li}.{bi}"
            params[dst] = {}
            for ci in (1, 2, 3):
                params[dst][f"conv{ci}"] = {
                    "kernel": _conv(sd[f"{src}.conv{ci}.weight"])}
            stats.setdefault(dst, {})
            for ci in (1, 2, 3):
                bkey = f"{src}.bn{ci}"
                params[dst][f"bn{ci}"] = {
                    "scale": sd[bkey + ".weight"].astype(np.float32),
                    "bias": sd[bkey + ".bias"].astype(np.float32)}
                stats[dst][f"bn{ci}"] = {
                    "mean": sd[bkey + ".running_mean"].astype(np.float32),
                    "var": sd[bkey + ".running_var"].astype(np.float32)}
            if f"{src}.downsample.0.weight" in sd:
                params[dst]["down_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
                params[dst]["down_bn"] = {
                    "scale": sd[f"{src}.downsample.1.weight"].astype(np.float32),
                    "bias": sd[f"{src}.downsample.1.bias"].astype(np.float32)}
                stats[dst]["down_bn"] = {
                    "mean": sd[f"{src}.downsample.1.running_mean"].astype(np.float32),
                    "var": sd[f"{src}.downsample.1.running_var"].astype(np.float32)}
    return params, stats


def load_torch_resnet50(path: str) -> Tuple[Dict, Dict]:
    """Load a .pth file (torch required) and convert."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_resnet50_state_dict(sd)


def merge_backbone_params(model_params: Dict, backbone_params: Dict,
                          model_stats: Dict, backbone_stats: Dict,
                          backbone_key: str = "backbone"):
    """Shape-filtered merge like the reference's state_dict load
    (trainer.py:59-69: silently keep model values on shape mismatch)."""
    import jax

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                continue
            if isinstance(v, dict):
                out[k] = merge(out[k], v)
            elif np.shape(out[k]) == np.shape(v):
                out[k] = jax.numpy.asarray(v)
        return out

    new_params = dict(model_params)
    new_params[backbone_key] = merge(model_params[backbone_key],
                                     backbone_params)
    new_stats = dict(model_stats)
    if backbone_key in new_stats:
        new_stats[backbone_key] = merge(model_stats[backbone_key],
                                        backbone_stats)
    return new_params, new_stats
