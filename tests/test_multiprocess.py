"""REAL 2-process distributed runtime test.

The equivalent of actually launching ``torch.distributed.launch
--nproc_per_node=2`` (reference train.py:80-83,
annotation/train_utils/distributed_utils.py:276-298): two CPU
subprocesses, 4 virtual devices each, joined by
``jax.distributed.initialize`` through ``multihost.init_distributed``.
Exercises the actual cross-process allgather (no injected fakes):

* ``gather_objects`` round-trips arbitrary pickled payloads of different
  sizes across ranks (distributed_utils.py:73-89);
* ``merge_eval_results`` image-id dedup when ranks overlap
  (coco_eval.py:11-31 EvalCOCOMetric.merge);
* ``evaluate_predictor`` sharded over both processes — the rank-0 dump
  must equal a single-process run of the same predictor;
* one orbax save/restore of a state sharded ACROSS the two processes
  (coordinated multi-host checkpoint, SURVEY §5.3-5.4).

The per-rank worker is this file itself run as a script (bottom).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class StubPredictor:
    """Deterministic host-only predictor: one detection per image derived
    from pixel content, so both the 2-process and single-process runs see
    identical inputs -> identical detections without any model compile."""

    def get_map_out(self, image):
        h, w = image.shape[:2]
        s = 0.1 + 0.8 * (float(image.mean()) / 255.0)
        boxes = np.array([[1.0, 2.0, w / 2.0, h / 2.0]], np.float32)
        mask = np.zeros((1, h, w), np.uint8)
        mask[0, : h // 2, : w // 2] = 1
        return boxes, np.array([s], np.float32), np.array([0], np.int64), mask


def _det_key(d):
    return (d["image_id"], d["category_id"], tuple(d["bbox"]),
            round(d["score"], 6))


def _train_step_probe(data_dir: str, num_shards: int = 1,
                      shard_index: int = 0):
    """ONE full YOLACT train step (fwd + multi-task loss + bwd + optimizer
    + EMA) over a mesh of ALL jax.devices(), fed by the real Loader with
    per-process input sharding. Deterministic end to end, so a 2-process
    8-device run and a single-process 8-device run of this same function
    must produce the same loss and updated params — the DDP-training
    equivalence the reference only ever checks by launching
    torch.distributed.launch by hand (train.py:80-83)."""
    import jax
    import numpy as np

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.data.augment import BaseTransform
    from instancesegmentation_tpu.data.datasets import (SegDataset,
                                                        synthetic_annotation)
    from instancesegmentation_tpu.data.loader import Loader, YolactCollate
    from instancesegmentation_tpu.models import get_model
    from instancesegmentation_tpu.ops.anchors import yolact_anchors
    from instancesegmentation_tpu.parallel import make_mesh, shard_batch
    from instancesegmentation_tpu.train.state import (create_train_state,
                                                      make_phase_optimizer)
    from instancesegmentation_tpu.train.steps import make_yolact_train_step

    cfg = get_config("yolact_synth", input_shape=(64, 64), max_instances=4,
                     ema=True, mixed_precision=False)
    ann = synthetic_annotation(data_dir)
    ds = SegDataset(ann.train_image_path, ann.train_coco, ann.label_map,
                    transform=BaseTransform(cfg.input_shape))
    loader = Loader(ds, batch_size=8,
                    collate=YolactCollate(cfg.max_instances, cfg.proto_shape),
                    shuffle=True, seed=7, num_workers=1,
                    num_shards=num_shards, shard_index=shard_index)
    batch = next(iter(loader.epoch(0)))
    batch.pop("image_id")

    model = get_model(cfg, train_mode=True)
    anchors = yolact_anchors(cfg.input_shape, cfg.anchors_size)
    sample = np.zeros((8,) + tuple(cfg.input_shape) + (3,), np.float32)
    state = create_train_state(model, cfg, jax.random.key(0), sample,
                               lr=1e-4, frozen_backbone=True)
    # numpy leaves: identical host-local values on every process are the
    # documented-safe replicated-input form for multi-process jit
    state = jax.tree_util.tree_map(np.asarray, state)
    tx = make_phase_optimizer(cfg, 1e-4, True, state.params)
    step = jax.jit(make_yolact_train_step(model, tx, anchors, cfg,
                                          frozen_backbone=True))
    mesh = make_mesh(jax.devices())
    rng = np.asarray(jax.random.PRNGKey(1))
    with mesh:
        device_batch = shard_batch(batch, mesh)
        # AOT-compile, then barrier: the cross-process gloo context for
        # the step's collectives has a ~30 s init deadline, and per-rank
        # jit compile times skew by more than that under CPU contention —
        # the fast rank's gloo init times out while the slow rank is
        # still compiling. Compile is process-local, so align on the
        # coordination service (no collective) before first execution.
        compiled = step.lower(state, device_batch, rng).compile()
        if jax.process_count() > 1:
            from jax._src import distributed
            distributed.global_state.client.wait_at_barrier(
                "train_step_compiled", 600_000)
        new_state, metrics = compiled(state, device_batch, rng)
        jax.block_until_ready(metrics)
    return new_state, {k: float(v) for k, v in metrics.items()}


def _worker(rank: int, port: str, workdir: str):
    import jax

    from instancesegmentation_tpu.parallel import multihost as mh

    assert mh.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2 and mh.world_size() == 2
    assert mh.process_rank() == rank
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8
    assert mh.is_main_process() == (rank == 0)

    # -- 1) real cross-process object allgather (ragged payloads) --------
    local = [{"rank": rank, "i": i} for i in range(rank + 2)]
    merged = mh.gather_objects(local)
    assert sorted(m["rank"] for m in merged) == [0, 0, 1, 1, 1], merged
    assert {(m["rank"], m["i"]) for m in merged} == \
        {(0, 0), (0, 1), (1, 0), (1, 1), (1, 2)}

    # -- 2) eval-merge image-id dedup with REAL overlap ------------------
    local_res = ([{"image_id": 1, "v": "r0"}, {"image_id": 2, "v": "r0"}]
                 if rank == 0 else
                 [{"image_id": 2, "v": "r1"}, {"image_id": 3, "v": "r1"}])
    out = mh.merge_eval_results(local_res)
    assert {(r["image_id"], r["v"]) for r in out} == \
        {(1, "r0"), (2, "r0"), (3, "r1")}, out

    # -- 3) sharded eval -> rank-0 dump ----------------------------------
    from instancesegmentation_tpu.data.datasets import (SegDataset,
                                                        synthetic_annotation)
    from instancesegmentation_tpu.data.eval_runner import evaluate_predictor
    ann = synthetic_annotation(os.path.join(workdir, "data"))
    ds = SegDataset(ann.val_image_path, ann.val_coco, ann.label_map)
    evaluate_predictor(StubPredictor(), ds, ann.label_map,
                       os.path.join(workdir, "out_mp"),
                       max_images=9, map_mode=1)

    # -- 4) orbax checkpoint of a cross-process sharded state ------------
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from instancesegmentation_tpu.train.checkpoints import CheckpointIO
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    full = np.arange(48, dtype=np.float32).reshape(16, 3)
    x = jax.make_array_from_callback((16, 3), sharding, lambda idx: full[idx])
    io = CheckpointIO(os.path.join(workdir, "ckpt"))
    io.save("mp_state", {"x": x, "step": jnp.asarray(3, jnp.int32)},
            meta={"epoch": 1})
    io.wait()
    restored = io.restore_raw("mp_state")
    # x restores as a GLOBAL sharded array: verify this process's shards
    rx = restored["x"]
    assert rx.shape == (16, 3)
    shards = getattr(rx, "addressable_shards", None)
    if shards is None:                       # restored as plain numpy
        np.testing.assert_allclose(np.asarray(rx), full)
    else:
        assert len(shards) > 0
        for shard in shards:
            np.testing.assert_allclose(np.asarray(shard.data),
                                       full[shard.index])
    assert int(restored["step"]) == 3
    assert io.load_meta("mp_state") == {"epoch": 1}

    # -- 5) REAL cross-process TRAIN step -------------------------------
    # each rank decodes only its loader shard; shard_batch assembles the
    # global batch; one jitted train step runs across both processes.
    # Updated params + loss go to a coordinated checkpoint the parent
    # compares against a single-process run of the same global batch.
    new_state, losses = _train_step_probe(os.path.join(workdir, "data"),
                                          num_shards=2, shard_index=rank)
    assert np.isfinite(losses["total"]), losses
    io.save("mp_train_step", {"params": new_state.params},
            meta={"losses": losses})
    io.wait()
    print(f"RANK{rank}_OK")


def test_two_process_distributed(tmp_path):
    workdir = str(tmp_path)
    # pre-generate the dataset so workers don't race generation
    from instancesegmentation_tpu.data.datasets import (SegDataset,
                                                        synthetic_annotation)
    ann = synthetic_annotation(os.path.join(workdir, "data"))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO          # drop the axon sitecustomize
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        # share the suite's persistent compile cache (keys include the
        # device topology, so 2x4-device worker entries don't collide)
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             str(rank), port, workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, out in enumerate(outs):        # both, for failure diagnosis
        print(f"---- rank {rank} output ----\n{out}")
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed (see printed output)"
        assert f"RANK{rank}_OK" in out, out

    # the rank-0 dump must equal a single-process run of the same stub
    from instancesegmentation_tpu.data.eval_runner import evaluate_predictor
    ds = SegDataset(ann.val_image_path, ann.val_coco, ann.label_map)
    evaluate_predictor(StubPredictor(), ds, ann.label_map,
                       os.path.join(workdir, "out_sp"),
                       max_images=9, map_mode=1)
    for fname in ("bbox_detections.json", "mask_detections.json"):
        with open(os.path.join(workdir, "out_mp", fname)) as f:
            mp = json.load(f)
        with open(os.path.join(workdir, "out_sp", fname)) as f:
            sp = json.load(f)
        assert len(mp) == len(sp) == 9
        if fname.startswith("bbox"):
            assert sorted(map(_det_key, mp)) == sorted(map(_det_key, sp))
        else:
            key = (lambda d: (d["image_id"], d["category_id"],
                              tuple(d["segmentation"]["size"]),
                              d["segmentation"]["counts"]))
            assert sorted(map(key, mp)) == sorted(map(key, sp))

    # the cross-process train step must equal a single-process run on the
    # same global batch: same loss dict, same updated params (item: DDP
    # training correctness by test, not by construction)
    sp_state, sp_losses = _train_step_probe(os.path.join(workdir, "data"))
    from instancesegmentation_tpu.train.checkpoints import CheckpointIO
    io = CheckpointIO(os.path.join(workdir, "ckpt"))
    mp_losses = io.load_meta("mp_train_step")["losses"]
    assert set(mp_losses) == set(sp_losses)
    for k in sp_losses:
        assert abs(mp_losses[k] - sp_losses[k]) <= 1e-4 + 1e-4 * abs(
            sp_losses[k]), (k, mp_losses[k], sp_losses[k])
    mp_params = io.restore_raw("mp_train_step")["params"]
    import jax
    sp_map = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_flatten_with_path(sp_state.params)[0]}
    mp_map = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_flatten_with_path(mp_params)[0]}
    assert set(sp_map) == set(mp_map)
    # atol 2e-4 = 2x the probe's lr: the cross-process gradient psum
    # reduces in a different order than the single-process one, and a
    # last-ulp grad difference through adam's m/(sqrt(v)+eps) normalizer
    # can move one update by up to ~2*lr (observed: 2 of 262k elements
    # of one kernel at 5.4e-5). Everything beyond reduction-order noise
    # (wrong batch rows, missing psum, desynced rng) shows at 1e-2+.
    for k, sp_leaf in sp_map.items():
        np.testing.assert_allclose(np.asarray(mp_map[k]),
                                   np.asarray(sp_leaf),
                                   rtol=1e-5, atol=2e-4, err_msg=k)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), sys.argv[2], sys.argv[3])
