"""Device-residency helpers.

``pin_to_device`` exists because of a measured behavior of the tunneled
axon TPU backend: buffers created by ``jax.device_put`` (or passed as
host numpy) remain host-backed and are RE-UPLOADED on every execution
that consumes them — for Mask R-CNN's ~176 MB parameter tree that is
~3.7 s per inference call (traced: 0.5 s dispatch + 3.2 s sync, device
busy 9 ms). Buffers that are the OUTPUT of a device execution are
device-resident, so routing a pytree through a trivial jitted computation
once makes every later use fast (10.6 ms/call measured after pinning).
On normal backends the pin is one cheap extra execution at setup.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def host_feed_only() -> bool:
    """True when explicit async ``device_put`` staging should be skipped
    and host numpy fed straight into the jitted step instead.

    On the tunneled axon relay, ``device_put`` buffers stay host-backed
    (see module docstring): pre-staging wins no transfer/compute overlap
    — the bytes re-upload at execution regardless — and each staged
    ``device_put`` costs an extra relay round-trip per batch. Feeding
    host numpy and letting jit transfer at call time is the same-cost,
    one-fewer-RPC path there (it is also how the predictors have always
    fed, hundreds of live executions per eval). Real TPU backends keep
    the staging path: there the transfer is genuinely async and sharded
    placement requires it.

    Detection: JAX_PLATFORMS=axon (an explicit request), OR the LIVE
    backend's platform_version (reads "axon 0.1.0; ..." on the relay) —
    the sitecustomize in the relay image force-initializes axon
    regardless of JAX_PLATFORMS, so the env var alone can miss it."""
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    try:
        return "axon" in jax.devices()[0].client.platform_version.lower()
    except Exception:
        return False


def _refresh(x):
    """Identity that XLA cannot alias away to the (host-backed) input."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(x)
        return jax.random.wrap_key_data(data + jnp.zeros((), data.dtype),
                                        impl=jax.random.key_impl(x))
    if x.dtype == jnp.bool_:
        return jnp.logical_not(jnp.logical_not(x))
    return x + jnp.zeros((), x.dtype)


def pin_to_device(tree):
    """Return ``tree`` materialized as device-execution outputs."""
    return jax.jit(lambda t: jax.tree_util.tree_map(_refresh, t))(tree)
