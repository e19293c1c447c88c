"""Train state (params + BN stats + optimizer + EMA) and optimizer factory.

Reference counterparts:
* optimizer zoo — /root/reference/models/init_model.py:56-62
  (adam/adamw betas=(momentum, 0.999); sgd nesterov, momentum).
* freeze/unfreeze — nets/yolact.py:207-213 toggles requires_grad on the
  backbone only; BN running stats KEEP updating. Here: an optax
  multi_transform zeroes backbone updates in the freeze phase while the
  flax batch_stats collection updates as usual — exact semantics, and both
  phase optimizers are built up front so the jitted step never retraces.
* EMA — utils/helpers.py:34-64 (decay 0.9999 with 1-exp(-step/2000) ramp).
  NOTE the reference constructs ModelEMA but never calls update()
  (SURVEY §2.7); we implement the *intended* behavior, gated by cfg.ema.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                 # ()
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def make_optimizer(optimizer_type: str, momentum: float, weight_decay: float,
                   lr: float = 1e-3) -> optax.GradientTransformation:
    """lr is injected as a mutable hyperparam so the host-side epoch
    schedule (schedules.get_lr_scheduler) can set it without retracing."""
    def base(learning_rate):
        if optimizer_type == "adam":
            # torch Adam treats weight_decay as L2 on the gradient
            tx = optax.adam(learning_rate, b1=momentum, b2=0.999)
            if weight_decay:
                tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
            return tx
        if optimizer_type == "adamw":
            return optax.adamw(learning_rate, b1=momentum, b2=0.999,
                               weight_decay=weight_decay)
        if optimizer_type == "sgd":
            return optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay
                else optax.identity(),
                optax.sgd(learning_rate, momentum=momentum, nesterov=True))
        raise ValueError(f"unknown optimizer {optimizer_type!r}")
    return optax.inject_hyperparams(base)(learning_rate=lr)


_BN_NAMES = ("bn1", "bn2", "bn3", "down_bn")


def backbone_trainability(params, frozen_backbone: bool, net: str = "yolact",
                          trainable_layers: int = 5,
                          frozen_bn: bool = False) -> Any:
    """Label tree for multi_transform ('train' / 'frozen').

    Three freeze sources, matching the reference:
    * phase freeze — freeze_backbone(): the yolact backbone
      (nets/yolact.py:207-209) or, for Mask R-CNN, the whole
      BackboneWithFPN = body + FPN (faster_rcnn_framework.py:117-119).
    * trainable_layers (Mask R-CNN only, resnet50_fpn_model.py:163-180):
      ['layer4','layer3','layer2','layer1','conv1'][:n] train, the rest of
      the resnet body is PERMANENTLY frozen ('bn1' added only at n=5).
    * frozen_bn: FrozenBatchNorm2d affine params never train (they are
      buffers in torchvision's FrozenBatchNorm2d).
    """
    is_rcnn = net == "mask_rcnn"
    layers_to_train = ["layer4", "layer3", "layer2", "layer1",
                       "conv1"][:trainable_layers]
    if trainable_layers == 5:
        layers_to_train.append("bn1")
    phase_roots = ("backbone", "fpn") if is_rcnn else ("backbone",)

    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for k in flat:
        frozen = frozen_backbone and k[0] in phase_roots
        if k[0] == "backbone":
            if is_rcnn and not any(k[1].startswith(t)
                                   for t in layers_to_train):
                frozen = True
            if frozen_bn and k[-2] in _BN_NAMES:
                frozen = True
        labels[k] = "frozen" if frozen else "train"
    return flax.traverse_util.unflatten_dict(labels)


def make_phase_optimizer(cfg, lr: float, frozen_backbone: bool, params
                         ) -> optax.GradientTransformation:
    inner = make_optimizer(cfg.optimizer_type, cfg.momentum,
                           cfg.weight_decay, lr)
    labels = backbone_trainability(
        params, frozen_backbone, net=cfg.net,
        trainable_layers=(cfg.trainable_layers if cfg.net == "mask_rcnn"
                          else 5),
        frozen_bn=cfg.frozen_bn)
    flat = flax.traverse_util.flatten_dict(labels)
    if all(v == "train" for v in flat.values()):
        # NOTE: optax.flatten was tried here to collapse the per-tensor
        # adam fusions into one vector op and measured SLOWER (36.2 vs
        # 34.7 ms/step, YOLACT 544^2 b8) — the ravel/unravel copies defeat
        # XLA's in-place buffer donation of m/v/params.
        return inner
    return optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, labels)


def set_learning_rate(opt_state, lr: float):
    """Update the injected hyperparam in-place (host side, per epoch)."""
    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(
                lr, s.hyperparams["learning_rate"].dtype)
        return s
    return jax.tree_util.tree_map(
        visit, opt_state,
        is_leaf=lambda s: hasattr(s, "hyperparams"))


def get_learning_rate(opt_state) -> Optional[float]:
    out = []

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            out.append(float(s.hyperparams["learning_rate"]))
        return s
    jax.tree_util.tree_map(visit, opt_state,
                           is_leaf=lambda s: hasattr(s, "hyperparams"))
    return out[0] if out else None


def ema_update(ema_params, new_params, step, decay: float, tau: float):
    """ModelEMA.update (utils/helpers.py:50-60): d = decay*(1-exp(-step/tau))."""
    d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        ema_params, new_params)


def create_train_state(model, cfg, rng, sample_image, lr: float,
                       frozen_backbone: bool, mesh=None) -> TrainState:
    """Initialize the full train state.

    The init graph runs on host CPU (it compiles pathologically slowly
    through the TPU remote-compile path and has no reuse); the state is
    then placed replicated on the mesh (or left for jit to move on the
    first step when no mesh is given).
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    # bf16 graphs compile pathologically slowly on the CPU backend; params
    # are f32 either way, so init with an f32 clone of the model
    init_model = model
    if getattr(model, "dtype", jnp.float32) != jnp.float32:
        try:
            init_model = model.clone(dtype=jnp.float32)
        except Exception:
            init_model = model

    def init():
        variables = init_model.init({"params": rng}, sample_image, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = make_phase_optimizer(cfg, lr, frozen_backbone, params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                        if cfg.ema else None),
        )

    if cpu is not None:
        with jax.default_device(cpu):
            state = init()
    else:
        state = init()

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        replicated = NamedSharding(mesh, PartitionSpec())
        state = jax.device_put(state, replicated)
    return state
