#!/usr/bin/env python
"""Train CLI.

Mirrors the reference entry point (/root/reference/train.py:15-68):
``--config`` names a registered config, CLI overrides win, the full option
dump goes to <out>/commandline_args.txt, seeding is deterministic. No
``--distributed``/``--local_rank`` flags: the mesh covers every visible
device automatically (one process per host on TPU).

Examples:
  python train.py --config yolact_base --data_root ./dataset
  python train.py --config yolact_synth --smoke
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")  # silence XLA AOT-cache spam


import argparse
import json
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="yolact_base",
                   help="registered config name (see --list)")
    p.add_argument("--list", action="store_true", help="list configs and exit")
    p.add_argument("--resume", action="store_true",
                   help="resume from last_epoch_weights")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--out_root", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None,
                   help="override UnFreeze_Epoch (total epochs)")
    p.add_argument("--batch_size", type=int, default=None,
                   help="override freeze-phase batch size")
    p.add_argument("--save_period", type=int, default=None,
                   help="write checkpoints every N epochs (full-state "
                        "writes cost seconds; raise for long small runs)")
    p.add_argument("--smoke", action="store_true",
                   help="cap epochs/steps for a quick end-to-end check")
    p.add_argument("--no_augment", action="store_true",
                   help="train with resize-only transforms (diagnosis / "
                        "memorization runs)")
    p.add_argument("--f32", action="store_true",
                   help="disable bf16 mixed precision (the reference's "
                        "fp16 flag, inverted: bf16 is the default on TPU)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="override any Config field (repeatable), e.g. "
                        "--set roi_align_aligned=true --set lr=5e-5; value "
                        "is coerced to the field's type")
    return p.parse_args(argv)


def parse_set_overrides(pairs, cfg):
    """'key=value' strings -> typed Config overrides."""
    out = {}
    for pair in pairs:
        key, _, raw = pair.partition("=")
        if not _ or not hasattr(cfg, key):
            raise SystemExit(f"--set {pair!r}: unknown config field {key!r}")
        cur = getattr(cfg, key)
        try:
            if isinstance(cur, bool):
                val = raw.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                val = int(raw)
            elif isinstance(cur, float):
                val = float(raw)
            elif isinstance(cur, tuple):
                import ast
                lit = ast.literal_eval(raw)
                # scalar for a tuple field broadcasts to the field's
                # length (--set input_shape=544 -> (544, 544)), coerced
                # to the element type so 800.0 can't float an int tuple
                if isinstance(lit, (tuple, list)):
                    val = tuple(lit)
                else:
                    if cur and not isinstance(lit, type(cur[0])):
                        lit = type(cur[0])(lit)
                    val = (lit,) * max(len(cur), 1)
            else:
                val = raw
        except (ValueError, SyntaxError, TypeError) as e:
            raise SystemExit(
                f"--set {pair!r}: cannot coerce {raw!r} to the type of "
                f"{key!r} ({type(cur).__name__}): {e}")
        out[key] = val
    return out


def main(argv=None):
    args = parse_args(argv)
    from instancesegmentation_tpu.config import get_config, list_configs

    if args.list:
        print("\n".join(list_configs()))
        return 0

    overrides = {}
    for key, attr in (("data_root", "data_root"), ("out_root", "out_root"),
                      ("epochs", "unfreeze_epoch"),
                      ("batch_size", "freeze_batch_size"),
                      ("save_period", "save_period")):
        v = getattr(args, key)
        if v is not None:
            overrides[attr] = v
    cfg = get_config(args.config, **overrides)
    if args.smoke:
        cfg = cfg.replace(unfreeze_epoch=min(cfg.unfreeze_epoch, 2),
                          freeze_epoch=min(cfg.freeze_epoch, 1))
    if args.no_augment:
        cfg = cfg.replace(augment=False)
    if args.f32:
        cfg = cfg.replace(mixed_precision=False)
    if args.set:
        cfg = cfg.replace(**parse_set_overrides(args.set, cfg))

    out_dir = os.path.join(cfg.out_root, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "commandline_args.txt"), "w") as f:
        json.dump({**vars(args), "config": cfg.__dict__.__repr__()}, f,
                  indent=2, default=str)

    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    from instancesegmentation_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, resume=args.resume,
                      max_steps_per_epoch=8 if args.smoke else None)
    result = trainer.train()
    print(json.dumps({"final": result}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
