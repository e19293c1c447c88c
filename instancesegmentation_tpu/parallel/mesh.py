"""Device mesh + sharding helpers — the framework's entire distributed
runtime.

The reference's parallelism stack (SURVEY §2.7-2.8: NCCL process groups,
DistributedDataParallel, DistributedSampler, SyncBN, reduce_dict,
all_gather, barriers — trainer.py:29-143,
annotation/train_utils/distributed_utils.py) collapses on TPU to:

* one ``Mesh`` over all devices with a 'data' axis (a 'model' axis slot is
  kept in the API for future tensor-parallel headroom),
* ``NamedSharding(P('data'))`` on every batch leaf; params replicated,
* jit/GSPMD inserting the gradient psums and global BatchNorm statistics
  (= SyncBN) automatically,
* per-host input sharding instead of DistributedSampler.

No explicit collectives, process groups, or barriers appear anywhere in
user code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over all (or given) devices. 1-axis default = pure data
    parallelism; pass axes=('data','model') + shape for hybrid layouts."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(tuple(shape)), tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict with its leading dim split over the data
    axis (the DistributedSampler replacement, models/init_model.py:88-92).

    Single-process: ``batch`` is the GLOBAL batch; device_put splits it
    across local chips. Multi-process: ``batch`` is this PROCESS'S
    contiguous slice of the global batch (the loader's
    num_shards/shard_index split, data/loader.py) and
    ``jax.make_array_from_process_local_data`` assembles the global
    sharded array — each host only ever materializes its own rows.
    Contiguous (not strided) rank slices match the mesh's device order
    (process 0's devices lead ``jax.devices()``), so the assembled global
    batch equals the single-process concatenation in rank order —
    verified by the cross-process train-step equivalence test
    (tests/test_multiprocess.py)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
