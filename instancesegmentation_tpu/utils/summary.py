"""Model summary -> <out>/model.txt — parity with the reference's torchinfo
dump (/root/reference/utils/utils_info.py:6-14, called trainer.py:55).
Uses flax's tabulate plus a param/byte count footer.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def write_info(model, sample_input, out_dir: str, train: bool = False):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "model.txt")
    # run everything on host CPU: summary graphs compile pathologically
    # slowly through the TPU remote-compile path
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib
    import jax.numpy as jnp
    if getattr(model, "dtype", jnp.float32) != jnp.float32:
        try:   # bf16 compiles pathologically slowly on CPU; f32 clone
            model = model.clone(dtype=jnp.float32)
        except Exception:
            pass
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        try:
            import flax.linen as nn
            table = nn.tabulate(
                model, jax.random.key(0),
                compute_flops=False, compute_vjp_flops=False)(
                sample_input, train)
        except Exception as e:  # tabulate is best-effort; counts still written
            table = f"(tabulate unavailable: {e})\n"
        variables = model.init({"params": jax.random.key(0)}, sample_input,
                               train=train)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(variables["params"]))
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(variables["params"]))
    with open(path, "w") as f:
        f.write(table)
        f.write(f"\nTotal params: {n_params:,} ({n_bytes / 1e6:.1f} MB f32)\n")
    return path
