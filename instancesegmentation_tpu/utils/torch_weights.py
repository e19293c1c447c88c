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


def _dense(w) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return np.transpose(np.asarray(w, np.float32), (1, 0))


def _dense_from_nhwc_flatten(w, c: int, h: int, w_: int) -> np.ndarray:
    """torch Linear over a CHW-flattened roi feature -> flax Dense over the
    NHWC flatten (TwoMLPHead flattens (7,7,C); torch flattens (C,7,7)).
    w: (out, c*h*w) -> kernel (h*w*c, out)."""
    out = w.shape[0]
    return (np.asarray(w, np.float32)
            .reshape(out, c, h, w_).transpose(2, 3, 1, 0)
            .reshape(h * w_ * c, out))


def _deconv(w) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, in, out). flax's lax.conv_transpose treats the kernel
    as a regular conv over the fractionally-strided input, which equals
    torch's gradient-of-conv semantics with the SPATIALLY FLIPPED kernel."""
    w = np.asarray(w, np.float32)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def convert_maskrcnn_state_dict(state_dict: Dict, num_fc_channels: int = 256,
                                drop_predictor: bool = True
                                ) -> Tuple[Dict, Dict]:
    """torchvision maskrcnn_resnet50_fpn state_dict -> (params, batch_stats)
    for models.mask_rcnn.model.MaskRCNN.

    Mirrors the reference's COCO-pretrained load (mask_rcnn.py:202-209):
    box_predictor.* and mask_fcn_logits.* are dropped (num_classes differs
    from COCO's 91), everything else maps. Callers merge with
    ``merge_params`` (shape-filtered, like load_state_dict(strict=False)).
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    params, stats = convert_resnet50_state_dict(body)
    params = {"backbone": params}
    stats = {"backbone": stats}

    def conv_entry(src):
        e = {"kernel": _conv(sd[src + ".weight"])}
        if src + ".bias" in sd:
            e["bias"] = sd[src + ".bias"].astype(np.float32)
        return e

    fpn = {}
    for i in range(4):
        # torchvision <=0.12: inner_blocks.{i}.weight; newer wraps in a
        # Conv2dNormActivation: inner_blocks.{i}.0.weight
        for fmt in (f"backbone.fpn.inner_blocks.{i}",
                    f"backbone.fpn.inner_blocks.{i}.0"):
            if fmt + ".weight" in sd:
                fpn[f"inner{i}"] = conv_entry(fmt)
        for fmt in (f"backbone.fpn.layer_blocks.{i}",
                    f"backbone.fpn.layer_blocks.{i}.0"):
            if fmt + ".weight" in sd:
                fpn[f"layer{i}"] = conv_entry(fmt)
    params["fpn"] = fpn

    params["rpn_head"] = {
        "conv": conv_entry("rpn.head.conv"),
        "cls_logits": conv_entry("rpn.head.cls_logits"),
        "bbox_pred": conv_entry("rpn.head.bbox_pred"),
    }
    params["box_head"] = {
        "fc6": {"kernel": _dense_from_nhwc_flatten(
                    sd["roi_heads.box_head.fc6.weight"],
                    num_fc_channels, 7, 7),
                "bias": sd["roi_heads.box_head.fc6.bias"].astype(np.float32)},
        "fc7": {"kernel": _dense(sd["roi_heads.box_head.fc7.weight"]),
                "bias": sd["roi_heads.box_head.fc7.bias"].astype(np.float32)},
    }
    mask_head = {}
    for i in range(1, 5):
        mask_head[f"mask_fcn{i}"] = conv_entry(
            f"roi_heads.mask_head.mask_fcn{i}")
    mask_head["conv5_mask"] = {
        "kernel": _deconv(sd["roi_heads.mask_predictor.conv5_mask.weight"]),
        "bias": sd["roi_heads.mask_predictor.conv5_mask.bias"].astype(
            np.float32)}
    if not drop_predictor:
        mask_head["mask_fcn_logits"] = conv_entry(
            "roi_heads.mask_predictor.mask_fcn_logits")
        params["box_predictor"] = {
            "cls_score": {
                "kernel": _dense(sd["roi_heads.box_predictor.cls_score.weight"]),
                "bias": sd["roi_heads.box_predictor.cls_score.bias"].astype(
                    np.float32)},
            "bbox_pred": {
                "kernel": _dense(sd["roi_heads.box_predictor.bbox_pred.weight"]),
                "bias": sd["roi_heads.box_predictor.bbox_pred.bias"].astype(
                    np.float32)},
        }
    params["mask_head"] = mask_head
    return params, stats


def load_torch_maskrcnn(path: str, drop_predictor: bool = True
                        ) -> Tuple[Dict, Dict]:
    """Load a torchvision maskrcnn_resnet50_fpn .pth and convert
    (reference: model_data/weight/maskrcnn_resnet50_fpn_coco.pth,
    mask_rcnn.py:202-209)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_maskrcnn_state_dict(sd, drop_predictor=drop_predictor)


def load_torch_resnet50(path: str) -> Tuple[Dict, Dict]:
    """Load a .pth file (torch required) and convert."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_resnet50_state_dict(sd)


def merge_params(model_tree: Dict, new_tree: Dict) -> Dict:
    """Top-level shape-filtered merge (load_state_dict(strict=False) with
    the reference's silent shape-mismatch skip, trainer.py:59-69)."""
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

    return merge(model_tree, new_tree)


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
