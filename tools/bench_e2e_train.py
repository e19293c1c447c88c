#!/usr/bin/env python
"""Sustained END-TO-END train throughput: the real Trainer loop — live
Loader (decode + augment + collate), staged H2D prefetch, jitted train
step — vs the pinned-synthetic-batch device numbers (bench.py /
tools/bench_train_step.py). The gap is the feeding ratio of THIS host
(the reference's hot loop includes its DataLoader the same way,
models/script.py:159-216).

  python tools/bench_e2e_train.py --config yolact_base --epochs 3 \
      --set exp_name=shape --set "class_names=('square','triangle','circle')" \
      --set data_root=/tmp/instseg_synth544 [--set cache_images=true]

Prints per-epoch img/s for the TRAIN loop only (val skipped), plus the
mean over the post-warmup epochs.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="yolact_base")
    ap.add_argument("--epochs", type=int, default=3,
                    help="first epoch is warmup (compiles), rest timed")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--phase", choices=["freeze", "unfreeze"],
                    default="unfreeze")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    dest="overrides")
    args = ap.parse_args()

    from train import parse_set_overrides

    from instancesegmentation_tpu.config import get_config
    from instancesegmentation_tpu.train.trainer import Trainer
    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()

    import jax

    cfg = get_config(args.config, out_root="/tmp/instseg_e2e_bench")
    if args.overrides:
        cfg = cfg.replace(**parse_set_overrides(args.overrides, cfg))
    # pin the requested phase for the whole measurement
    if args.phase == "unfreeze":
        cfg = cfg.replace(freeze_train=False)
    if args.batch:
        cfg = cfg.replace(freeze_batch_size=args.batch,
                          unfreeze_batch_size=args.batch)

    tr = Trainer(cfg)
    n_img = len(tr.train_ds) // tr.batch_size * tr.batch_size
    rng = jax.random.key(cfg.seed + 1)
    rates = []
    for e in range(args.epochs):
        loader, _ = tr._loaders()
        t0 = time.perf_counter()
        loss = tr._run_train_epoch(loader, e, rng, 1e-4)
        dt = time.perf_counter() - t0
        rate = n_img / dt
        tag = " (warmup)" if e == 0 else ""
        print(f"epoch {e}: {rate:.1f} img/s fed "
              f"({dt:.1f}s, {1e3 * dt / (n_img // tr.batch_size):.0f} "
              f"ms/step incl. feed, loss {loss:.3f}){tag}", flush=True)
        if e > 0:
            rates.append(rate)
    if rates:
        print(f"steady-state fed throughput: "
              f"{sum(rates) / len(rates):.1f} img/s "
              f"(b{tr.batch_size}, {len(tr.train_ds)} imgs, "
              f"workers={cfg.num_workers}, augment={cfg.augment}, "
              f"cache_images={cfg.cache_images})")


if __name__ == "__main__":
    main()
