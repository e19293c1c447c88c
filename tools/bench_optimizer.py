#!/usr/bin/env python
"""Microbench: isolate the optimizer+EMA cost of a YOLACT-sized train step.

Round-2 traces attribute ~6.6 ms/step (YOLACT b8) to adam+EMA per-tensor
updates; optax.flatten was tried in-graph and measured SLOWER (36.2 vs
34.7 ms/step) — attributed to ravel/unravel copies defeating donation
(train/state.py:108-112). This bench measures the update in ISOLATION so
the attribution stops being trace-approximate:

  tree   — the shipped path: inject_hyperparams(chain(wd, adam)) over the
           param tree + apply_updates + ema_update, donated.
  flat   — one fused jnp update over a single flat f32 vector per role
           (m, v, ema flat in the state; grads concatenated per step,
           new params split back out to the tree), donated.
  floor  — the same fused math with NO concat/split (state fully flat):
           the pure HBM-bandwidth floor of adam+EMA.

Run on the real TPU:  python tools/bench_optimizer.py [--iters 50]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def tree_spec(params):
    leaves = jax.tree_util.tree_leaves(params)
    sizes = [int(np.prod(l.shape)) for l in leaves]
    return sizes


def flatten_tree(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([l.reshape(-1).astype(jnp.float32)
                            for l in leaves])


def unflatten_like(flat, params):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out, off = [], 0
    for l in leaves:
        n = int(np.prod(l.shape))
        out.append(flat[off:off + n].reshape(l.shape).astype(l.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def fused_adam_ema(p, m, v, g, ema, step, lr, b1, b2, eps, wd, ema_decay,
                   ema_tau):
    g = g + wd * p
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * (g * g)
    t = step.astype(jnp.float32)
    mhat = m / (1 - b1 ** t)
    vhat = v / (1 - b2 ** t)
    p = p - lr * mhat / (jnp.sqrt(vhat) + eps)
    d = ema_decay * (1.0 - jnp.exp(-t / ema_tau))
    ema = ema * d + p * (1 - d)
    return p, m, v, ema


def timed(fn, state, g, iters):
    # sync via a SCALAR reduction: np.asarray of a large leaf would time
    # the ~1 GB/s tunnel D2H (measured 150 ms/iter of pure artifact)
    sync = jax.jit(lambda s: jnp.sum(jax.tree_util.tree_leaves(s)[0][:8]))
    state = fn(state, g)                     # compile
    float(sync(state))
    for _ in range(3):
        state = fn(state, g)
    float(sync(state))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state, g)
    float(sync(state))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--optimizer", default="adam", choices=("adam", "sgd"))
    args = ap.parse_args()

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.train.state import (ema_update,
                                                      make_optimizer)
    from instancesegmentation_tpu.utils.device import pin_to_device

    cfg = get_config("yolact_base", mixed_precision=True)
    model = get_model(cfg, train_mode=True)
    with jax.default_device(jax.devices("cpu")[0]):
        img = np.zeros((1,) + tuple(cfg.input_shape) + (3,), np.float32)
        variables = model.clone(dtype=jnp.float32).init(
            {"params": jax.random.key(0)}, img, train=True)
    params = variables["params"]
    nparam = sum(tree_spec(params))
    print(f"params: {nparam/1e6:.1f} M ({nparam*4/1e6:.0f} MB f32)")

    lr, b1, b2, eps, wd = 1e-3, 0.9, 0.999, 1e-8, 5e-4
    ema_decay, ema_tau = 0.9999, 2000.0

    dev = jax.devices()[0]
    put = lambda t: pin_to_device(jax.device_put(t, dev))

    # fake grads, same tree/dtypes as params (grads are f32 here: the
    # value_and_grad of an f32-param graph yields f32 grads)
    g_tree = put(jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, 1e-4, p.dtype), params))

    # --- tree (shipped path) ---
    tx = make_optimizer(args.optimizer, b1 if args.optimizer == "adam"
                        else 0.9, wd, lr)

    def tree_step(state, g):
        p, opt, ema, step = state
        updates, opt = tx.update(g, opt, p)
        import optax
        p = optax.apply_updates(p, updates)
        step = step + 1
        ema = ema_update(ema, p, step, ema_decay, ema_tau)
        return p, opt, ema, step

    state0 = (params, tx.init(params),
              jax.tree_util.tree_map(jnp.copy, params),
              jnp.zeros((), jnp.int32))
    state0 = put(state0)
    fn = jax.jit(tree_step, donate_argnums=0)
    ms = timed(fn, state0, g_tree, args.iters)
    print(f"tree  {args.optimizer}+ema: {ms:7.3f} ms/step")

    # --- flat (tree params kept; m/v/ema flat; concat g, split p) ---
    def flat_step(state, g):
        p_tree, m, v, ema, step = state
        gf = flatten_tree(g)
        pf = flatten_tree(p_tree)
        step = step + 1
        pf, m, v, ema = fused_adam_ema(pf, m, v, gf, ema, step, lr, b1, b2,
                                       eps, wd, ema_decay, ema_tau)
        return unflatten_like(pf, p_tree), m, v, ema, step

    zeros = jnp.zeros((nparam,), jnp.float32)
    state0 = put((params, zeros, zeros, flatten_tree(params),
                  jnp.zeros((), jnp.int32)))
    fn = jax.jit(flat_step, donate_argnums=0)
    ms = timed(fn, state0, g_tree, args.iters)
    print(f"flat  adam+ema (concat/split): {ms:7.3f} ms/step")

    # --- floor (everything flat, no copies) ---
    def floor_step(state, g):
        p, m, v, ema, step = state
        step = step + 1
        p, m, v, ema = fused_adam_ema(p, m, v, g, ema, step, lr, b1, b2,
                                      eps, wd, ema_decay, ema_tau)
        return p, m, v, ema, step

    g_flat = put(jnp.full((nparam,), 1e-4, jnp.float32))
    state0 = put((flatten_tree(params), zeros, zeros, flatten_tree(params),
                  jnp.zeros((), jnp.int32)))
    fn = jax.jit(floor_step, donate_argnums=0)
    ms = timed(fn, state0, g_flat, args.iters)
    gb = nparam * 4 * 9 / 1e9
    print(f"floor adam+ema (all-flat):     {ms:7.3f} ms/step "
          f"({gb:.2f} GB ideal traffic -> {gb/ms*1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
