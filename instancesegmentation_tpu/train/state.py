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

import os
from typing import Any, Dict, NamedTuple, Optional

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


class FusedOptState(NamedTuple):
    """State of :class:`FusedTx`. ``hyperparams`` mirrors
    ``optax.inject_hyperparams`` so :func:`set_learning_rate` /
    :func:`get_learning_rate` work unchanged."""
    count: jnp.ndarray            # () int32 — reset at each phase switch
    mu: Any                       # first moment / momentum buffer tree
    nu: Any                       # second moment tree (adam) or {} (sgd)
    hyperparams: Dict[str, jnp.ndarray]


class FusedTx:
    """Single-pass fused optimizer + EMA update.

    The optax path (``inject_hyperparams(chain(add_decayed_weights,
    adam))`` + ``apply_updates`` + ``ema_update``) walks the 123 MB
    (YOLACT) parameter memory ~5 times in separate fused kernels —
    measured 6-10 ms/step on a v5e, vs a 2.25 ms floor for one fused
    pass at 492 GB/s (tools/bench_optimizer.py). This class computes
    exactly the same math — per leaf: L2 weight decay on the gradient,
    adam/adamw/sgd-nesterov moments + parameter update, and the EMA blend
    — in ONE ``tree_map`` so XLA emits one read-modify-write kernel per
    leaf and donation keeps every buffer in place.

    Numerical parity with the optax chain is asserted by
    tests/test_train_state.py (adam, adamw, sgd, frozen labels, LR swap).

    Frozen leaves (``multi_transform`` + ``set_to_zero`` semantics in the
    optax path) are compile-time identity branches: params/moments pass
    through untouched; EMA still tracks them, matching the unfused order
    (ema_update runs over the full tree after apply_updates).
    """

    def __init__(self, optimizer_type: str, momentum: float,
                 weight_decay: float, lr: float, labels=None):
        if optimizer_type not in ("adam", "adamw", "sgd"):
            raise ValueError(f"unknown optimizer {optimizer_type!r}")
        self.kind = optimizer_type
        self.momentum = float(momentum)
        self.weight_decay = float(weight_decay)
        self.lr0 = float(lr)
        self.labels = labels          # tree of 'train'/'frozen', or None

    # -- optax-compatible surface -------------------------------------
    def init(self, params) -> FusedOptState:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = (jax.tree_util.tree_map(jnp.zeros_like, params)
              if self.kind in ("adam", "adamw") else {})
        return FusedOptState(
            count=jnp.zeros((), jnp.int32), mu=zeros, nu=nu,
            hyperparams={"learning_rate": jnp.asarray(self.lr0,
                                                      jnp.float32)})

    # -- the fused step ------------------------------------------------
    def apply_fused(self, grads, opt_state: FusedOptState, params,
                    ema_params, step, ema_decay: float, ema_tau: float):
        """(new_params, new_opt_state, new_ema_params) in one pass.

        ``step`` is the GLOBAL train step (drives the EMA ramp,
        utils/helpers.py:50-60); ``opt_state.count`` is the per-phase
        update count (drives adam bias correction — the trainer re-inits
        the optimizer at the freeze->unfreeze switch while step runs on).
        """
        lr = opt_state.hyperparams["learning_rate"].astype(jnp.float32)
        cnt = opt_state.count + 1
        b1, b2, eps = self.momentum, 0.999, 1e-8
        wd, kind = self.weight_decay, self.kind
        if kind in ("adam", "adamw"):
            c = cnt.astype(jnp.float32)
            bc1 = 1.0 - b1 ** c          # optax scale_by_adam bias corr.
            bc2 = 1.0 - b2 ** c
        has_ema = ema_params is not None
        if has_ema:
            d = ema_decay * (1.0 - jnp.exp(
                -step.astype(jnp.float32) / ema_tau))

        def leaf(label, p, m, v, g, e):
            if label == "frozen":     # static branch: compile-time no-op
                return p, m, v, (e * d + p.astype(e.dtype) * (1.0 - d)
                                 if has_ema else e)
            if kind == "adam" and wd:
                g = g + wd * p        # L2-on-gradient (torch Adam)
            elif kind == "sgd" and wd:
                g = g + wd * p
            if kind in ("adam", "adamw"):
                m = b1 * m + (1.0 - b1) * g
                v = b2 * v + (1.0 - b2) * jnp.square(g)
                upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                if kind == "adamw" and wd:
                    upd = upd + wd * p
            else:                     # sgd + nesterov (optax trace)
                m = g + self.momentum * m
                upd = g + self.momentum * m
            p = p - lr * upd
            if has_ema:
                e = e * d + p.astype(e.dtype) * (1.0 - d)
            return p, m, v, e

        labels = self.labels if self.labels is not None else \
            jax.tree_util.tree_map(lambda _: "train", params)
        nu = opt_state.nu if kind in ("adam", "adamw") else \
            jax.tree_util.tree_map(lambda _: jnp.zeros((), jnp.float32),
                                   params)
        ema = ema_params if has_ema else \
            jax.tree_util.tree_map(lambda _: jnp.zeros((), jnp.float32),
                                   params)
        tups = jax.tree_util.tree_map(
            lambda lab, p, m, v, g, e: leaf(lab, p, m, v, g, e),
            labels, params, opt_state.mu, nu, grads, ema)
        outer = jax.tree_util.tree_structure(params)
        inner = jax.tree_util.tree_structure((0, 0, 0, 0))
        new_p, new_m, new_v, new_e = jax.tree_util.tree_transpose(
            outer, inner, tups)
        new_state = FusedOptState(
            count=cnt, mu=new_m,
            nu=new_v if kind in ("adam", "adamw") else {},
            hyperparams=dict(opt_state.hyperparams))
        return new_p, new_state, (new_e if has_ema else None)


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


def make_phase_optimizer(cfg, lr: float, frozen_backbone: bool, params,
                         fused: Optional[bool] = None):
    """Phase optimizer. Default: the fused single-pass update (FusedTx).

    ``INSTSEG_FUSED_OPT=0`` (or fused=False) falls back to the optax
    chain — the numerical reference the fused path is tested against.
    NOTE: optax.flatten was also tried and measured SLOWER (36.2 vs
    34.7 ms/step, YOLACT 544^2 b8) — ravel/unravel copies defeat XLA's
    in-place buffer donation of m/v/params; FusedTx instead fuses the
    passes without changing buffer shapes.
    """
    if fused is None:
        fused = os.environ.get("INSTSEG_FUSED_OPT", "1") != "0"
    labels = backbone_trainability(
        params, frozen_backbone, net=cfg.net,
        trainable_layers=(cfg.trainable_layers if cfg.net == "mask_rcnn"
                          else 5),
        frozen_bn=cfg.frozen_bn)
    flat = flax.traverse_util.flatten_dict(labels)
    all_train = all(v == "train" for v in flat.values())
    if fused and cfg.optimizer_type in ("adam", "adamw", "sgd"):
        return FusedTx(cfg.optimizer_type, cfg.momentum, cfg.weight_decay,
                       lr, labels=None if all_train else labels)
    inner = make_optimizer(cfg.optimizer_type, cfg.momentum,
                           cfg.weight_decay, lr)
    if all_train:
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
        # local_devices, not devices: in a multi-process run the global
        # device list leads with process 0's devices, which are
        # NON-ADDRESSABLE from other ranks — default_device on one of
        # those fails exactly where multi-host init must work
        cpu = jax.local_devices(backend="cpu")[0]
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
