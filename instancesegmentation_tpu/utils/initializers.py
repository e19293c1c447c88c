"""Weight-init zoo — parity with the reference's ``weights_init``
(/root/reference/models/init_model.py:10-28: normal / xavier / kaiming /
orthogonal over conv kernels, gain/std knobs). Returns flax initializers;
apply at module construction or re-init an existing tree with
``reinit_conv_kernels``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn import initializers as I


def get_initializer(init_type: str = "normal", init_gain: float = 0.02):
    if init_type == "normal":
        return I.normal(stddev=init_gain)
    if init_type == "xavier":
        return I.variance_scaling(init_gain, "fan_avg", "normal")
    if init_type == "kaiming":
        return I.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return I.orthogonal(scale=init_gain)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")


def reinit_conv_kernels(params, rng, init_type: str = "normal",
                        init_gain: float = 0.02):
    """Re-initialize every conv/dense kernel leaf in a param tree."""
    init = get_initializer(init_type, init_gain)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    leaves = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if key.endswith("['kernel']") and jnp.ndim(leaf) >= 2:
            rng, sub = jax.random.split(rng)
            leaves[key] = init(sub, jnp.shape(leaf), leaf.dtype)
        else:
            leaves[key] = leaf
    # rebuild
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [leaves[jax.tree_util.keystr(p)] for p, _ in flat])
