#!/usr/bin/env python
"""Device A/B: level-sorted RoIAlign kernel vs the separable-matmul form.

Realistic Mask R-CNN 544^2 shapes: B=4, C=256, P2..P5 136/68/34/17,
512 rois @ 7x7 (box head) and 128 rois @ 14x14 (mask head), fwd+bwd
through a scalar loss (same measurement for both paths).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_roi_sorted.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--rois", type=int, default=512)
    ap.add_argument("--size", type=int, default=544)
    ap.add_argument("--out", type=int, default=7)
    ap.add_argument("--fwd_only", action="store_true")
    ap.add_argument("--rb", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from instancesegmentation_tpu.ops.pallas.roi_align_sorted import \
        multiscale_roi_align_sorted
    from instancesegmentation_tpu.ops.roi_align import \
        multiscale_roi_align_separable
    from instancesegmentation_tpu.utils.device import pin_to_device

    b, r, img = args.batch, args.rois, args.size
    oh = ow = args.out
    scales = (0.25, 0.125, 0.0625, 0.03125)
    shapes = [(img // 4, img // 4), (img // 8, img // 8),
              (img // 16, img // 16), (-(-img // 32), -(-img // 32))]
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(b, h, w, 256), jnp.bfloat16)
             for h, w in shapes]
    x1 = rs.uniform(0, img * 0.6, (b, r))
    y1 = rs.uniform(0, img * 0.6, (b, r))
    w = rs.choice([8, 24, 64, 150, 400], (b, r)) * rs.uniform(0.6, 1.4,
                                                              (b, r))
    h = w * rs.uniform(0.6, 1.6, (b, r))
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1), jnp.float32)

    dev = jax.devices()[0]
    put = lambda t: pin_to_device(jax.device_put(t, dev))
    feats = [put(f) for f in feats]
    rois = put(rois)

    # rois MUST be a traced argument, as in the real model (RPN outputs).
    # Closing over them as a jit constant trips an axon-backend bug:
    # constant-folding of the strided row gather in sort_rois_by_level
    # corrupts roi columns 1-3 (y1/x2/y2) of the geometry table.
    def loss_sep(fs, rr):
        o = jax.vmap(lambda f2, f3, f4, f5, r1:
                     multiscale_roi_align_separable(
                         (f2, f3, f4, f5), r1, (oh, ow), scales))(*fs, rr)
        return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

    def loss_sorted(fs, rr):
        out = multiscale_roi_align_sorted(list(fs), rr, (oh, ow), scales,
                                          rb=args.rb)
        return jnp.sum(out.feats.astype(jnp.float32) ** 2) * 1e-6

    for name, fn in (("separable", loss_sep), ("sorted", loss_sorted)):
        if args.fwd_only:
            f = jax.jit(fn)
        else:
            f = jax.jit(jax.value_and_grad(fn))
        t0 = time.perf_counter()
        res = f(tuple(feats), rois)
        val = res[0] if not args.fwd_only else res
        print(f"{name}: compile {time.perf_counter()-t0:.1f}s "
              f"loss={float(val):.4f}")
        for _ in range(3):
            res = f(tuple(feats), rois)
        float(res[0] if not args.fwd_only else res)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            res = f(tuple(feats), rois)
        float(res[0] if not args.fwd_only else res)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.2f} ms/iter ({'fwd' if args.fwd_only else 'fwd+bwd'})")


if __name__ == "__main__":
    main()
