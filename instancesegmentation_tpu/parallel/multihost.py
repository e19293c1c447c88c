"""Multi-host runtime helpers.

The TPU equivalents of the reference's cross-rank plumbing:
* ``init_distributed`` — jax.distributed.initialize (the NCCL
  init_process_group analogue, trainer.py:29-37; on TPU pods the
  coordinator/rank discovery is automatic).
* ``gather_objects`` — all_gather_object for merging per-host eval results
  with image-id dedup (annotation/train_utils/distributed_utils.py:73-89 +
  coco_eval.py:11-31 merge).
* ``is_main_process`` / ``world_size`` — rank-0 gating for logging,
  checkpoints, json dumps (utils/tools.py:5-16 etc.).

Single-host runs short-circuit everything (no initialization needed).
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable, List, Sequence

import jax
import numpy as np


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize the multi-host runtime when running on more than one
    process. Safe to call unconditionally: no-ops for single-process."""
    if num_processes in (None, 1) and jax.process_count() == 1 \
            and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def world_size() -> int:
    return jax.process_count()


def process_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def gather_objects(local: Sequence[Any]) -> List[Any]:
    """All-gather arbitrary picklable objects across hosts (the
    all_gather_object replacement). Single-host: returns list(local)."""
    if jax.process_count() == 1:
        return list(local)
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(list(local)), dtype=np.uint8)
    # pad to the global max length, exchange sizes first
    size = np.array([payload.size], np.int32)
    all_sizes = multihost_utils.process_allgather(size).reshape(-1)
    max_size = int(all_sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # (P, max_size)
    out: List[Any] = []
    for row, n in zip(np.asarray(gathered).reshape(len(all_sizes), -1),
                      all_sizes):
        out.extend(pickle.loads(row[:int(n)].tobytes()))
    return out


def merge_eval_results(local_results: Sequence[dict],
                       _gather=None) -> List[dict]:
    """Cross-host merge with duplicate-IMAGE dedup (coco_eval.py:11-31 /
    EvalCOCOMetric.merge): when hosts evaluated overlapping image ids
    (padded sharding), every result of that image is kept from exactly one
    host — per-result dedup would double-count an image whose two hosts
    produced different detections. ``_gather`` is injectable for tests."""
    gather = _gather or gather_objects
    merged = gather([(process_rank(), list(local_results))])
    owner = {}
    out = []
    for rank, results in sorted(merged, key=lambda t: t[0]):
        for r in results:
            if owner.setdefault(r["image_id"], rank) == rank:
                out.append(r)
    return out
