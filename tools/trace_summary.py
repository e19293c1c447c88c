#!/usr/bin/env python
"""Summarize a jax.profiler.trace capture: per-op and per-category device
time from the .xplane.pb, grouped over the steady-state steps.

  python tools/bench_train_step.py --config yolact_base --batch 8 \
      --trace /tmp/trace_y
  python tools/trace_summary.py /tmp/trace_y [--top 40] [--by-category]

Parses with tensorflow.tsl.profiler.protobuf.xplane_pb2 — the
tensorboard_plugin_profile converter's protobuf gencode is too old for
this image (round-2 finding).
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_xplanes(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not pbs:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


CATEGORY_RULES = [
    ("conv", r"convolution|conv[-_.]"),
    ("matmul", r"dot|einsum"),
    ("bn-stats", r"batch[-_]?norm|bn[-_.]|reduce.*(mean|variance)"),
    ("allreduce", r"all-reduce|cross-replica"),
    ("fusion", r"^(loop_)?fusion"),
    ("copy", r"^copy|transpose|bitcast"),
    ("reduce", r"^reduce"),
    ("scatter/gather", r"scatter|gather|dynamic-slice|dynamic-update"),
    ("sort", r"sort|top-k"),
]


def categorize(name):
    low = name.lower()
    for cat, pat in CATEGORY_RULES:
        if re.search(pat, low):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--plane", default="",
                    help="substring of the plane name (default: pick the "
                         "device plane with the most event time)")
    args = ap.parse_args()

    xs = load_xplanes(args.trace_dir)

    best, best_time = None, -1
    for plane in xs.planes:
        if args.plane and args.plane not in plane.name:
            continue
        if not args.plane and "/device:" not in plane.name:
            continue
        total = sum(ev.duration_ps for line in plane.lines
                    for ev in line.events)
        if total > best_time:
            best, best_time = plane, total
    if best is None:
        sys.exit("no matching plane")
    print(f"plane: {best.name}")

    # the synchronous op timeline ("XLA Ops"), not the async DMA line
    line = None
    for l in best.lines:
        if l.name == "XLA Ops":
            line = l
    if line is None:
        line = max(best.lines, key=lambda l: sum(
            e.duration_ps for e in l.events))
    md = best.event_metadata
    per_op = collections.Counter()
    n_ev = collections.Counter()
    for ev in line.events:
        name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
        per_op[name] += ev.duration_ps / 1e9     # ms
        n_ev[name] += 1
    total = sum(per_op.values())
    print(f"line: {line.name}  events={sum(n_ev.values())}  "
          f"total={total:.2f} ms (all captured steps)")

    per_cat = collections.Counter()
    for name, ms in per_op.items():
        per_cat[categorize(name)] += ms
    print("\n-- by category --")
    for cat, ms in per_cat.most_common():
        print(f"{ms:10.3f} ms  {100*ms/total:5.1f}%  {cat}")

    print(f"\n-- top {args.top} ops --")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms:10.3f} ms  {100*ms/total:5.1f}%  x{n_ev[name]:<4d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
