"""Checkpointing via orbax: full train state, epoch + best + last aliases.

Covers (and fixes) the reference's .pth trio (models/script.py:125-144,
:259-279: ep%03d / best_epoch_weights / last_epoch_weights, rank-0 only,
params only). Here the FULL state (params, BN stats, optimizer, EMA, step)
is saved, so resume continues the schedule instead of restarting it
(SURVEY §5.4 flags the reference's missing optimizer state), and orbax
handles multi-host coordination.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointIO:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any, meta: Optional[Dict] = None):
        # 1) snapshot to host first: the trainer DONATES state buffers on
        #    the next step, which races orbax's async device reads (hangs).
        #    Multi-process runs skip this (device_get cannot materialize
        #    non-addressable shards; orbax writes each host's shards and
        #    coordinates across processes itself);
        # 2) serialize saves: force=True deletes the target dir, which
        #    races an in-flight async write to the same path.
        import jax
        if jax.process_count() == 1:
            host_state = jax.device_get(state)
        else:
            # cross-process-sharded arrays go to orbax as-is (it writes
            # each host's shards); host-local leaves (e.g. the step
            # scalar) are snapshotted to numpy, which orbax serializes as
            # replicated — as jax.Arrays they would be rejected
            # ("Cannot serialize host local jax.Array in multi-host")
            host_state = jax.tree_util.tree_map(
                lambda x: jax.device_get(x)
                if getattr(x, "is_fully_addressable", True) else x, state)
        self._ckptr.wait_until_finished()
        self._ckptr.save(self._path(name), host_state, force=True)
        if jax.process_count() > 1:
            # the non-addressable shards above went to orbax as LIVE device
            # arrays; the trainer donates state buffers on the next step,
            # which would race orbax's still-async device reads. Block here
            # (synchronous save) — only real multi-host runs pay this.
            self._ckptr.wait_until_finished()
        if meta is not None and jax.process_index() == 0:
            # sidecar epoch/phase record: resume derives start_epoch from
            # here instead of step // steps_per_epoch, which miscounts
            # across the phase switch (batch size changes at unfreeze)
            with open(self._path(name) + ".meta.json", "w") as f:
                json.dump(meta, f)

    def load_meta(self, name: str) -> Optional[Dict]:
        path = self._path(name) + ".meta.json"
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def save_epoch(self, epoch: int, state: Any, train_loss: float,
                   val_loss: float, is_best: bool,
                   keep_epoch_files: bool = False,
                   meta: Optional[Dict] = None):
        """Reference naming: ep%03d-loss%.3f-val_loss%.3f + best/last
        (models/script.py:134-144). Per-epoch snapshot files are opt-in:
        best+last cover resume/deploy, and a full-state snapshot per epoch
        triples checkpoint I/O for no benefit."""
        meta = {"epoch": epoch, **(meta or {})}
        if keep_epoch_files:
            self.save(f"ep{epoch + 1:03d}-loss{train_loss:.3f}"
                      f"-val_loss{val_loss:.3f}", state, meta)
        if is_best:
            self.save("best_epoch_weights", state, meta)
        self.save("last_epoch_weights", state, meta)

    def restore(self, name: str, template: Any) -> Any:
        self._ckptr.wait_until_finished()
        return self._ckptr.restore(self._path(name), template)

    def restore_raw(self, name: str) -> Any:
        """Template-free restore -> nested dict of numpy arrays.

        The optimizer-state TREE STRUCTURE differs between the freeze phase
        (multi_transform) and the unfreeze phase (plain optimizer), so a
        template built for the wrong phase makes orbax raise. Raw restore
        sidesteps the problem for consumers that only need a subset of the
        state (predictors: params/batch_stats/ema) or that can rebuild the
        rest (trainer resume)."""
        self._ckptr.wait_until_finished()
        try:
            return self._ckptr.restore(self._path(name))
        except ValueError:
            # checkpoint written under a DIFFERENT device topology (e.g. a
            # multi-process training run restored on a single-process
            # eval/predict host): template-free restore tries to rebuild
            # the saved shardings and fails; force plain host numpy
            import jax
            import numpy as np
            ptc = ocp.PyTreeCheckpointer()
            try:
                meta = ptc.metadata(self._path(name)).item_metadata
                restore_args = jax.tree_util.tree_map(
                    lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
                return ptc.restore(
                    self._path(name),
                    args=ocp.args.PyTreeRestore(restore_args=restore_args))
            finally:
                ptc.close()

    def has(self, name: str) -> bool:
        self._ckptr.wait_until_finished()
        return os.path.isdir(self._path(name))

    def latest_epoch_name(self) -> Optional[str]:
        self._ckptr.wait_until_finished()
        if self.has("last_epoch_weights"):
            return "last_epoch_weights"
        return None

    def wait(self):
        self._ckptr.wait_until_finished()


def load_inference_variables(checkpoint_path: str):
    """Restore {'params','batch_stats'} for inference from a train-state
    checkpoint dir, phase-agnostic (raw restore), preferring EMA weights
    when present (reference eval-with-EMA, models/script.py:90-93).

    Shared by both predictors and export (review finding: previously
    duplicated per-predictor AND crashing on cross-phase checkpoints)."""
    import os as _os
    io = CheckpointIO(_os.path.dirname(checkpoint_path))
    raw = io.restore_raw(_os.path.basename(checkpoint_path))
    params = raw.get("ema_params") or raw["params"]
    return {"params": params, "batch_stats": raw.get("batch_stats") or {}}
