"""Level-sorted batched MultiScaleRoIAlign Pallas kernel (fwd + bwd).

The replacement for the one-hot multiscale dispatch (every roi computed
at ALL four FPN levels, ops/roi_align.py:multiscale_roi_align_separable)
and its GB-scale (B, R, oh, W, C) backward intermediates — together
~14.6 ms of the 58 ms Mask R-CNN 544^2 b4 train step (trace, round 3).

Design (tpu-first, v2 after on-device ablation):

* Rois are sorted BY FPN LEVEL on the XLA side (tiny tensors), padded so
  every level segment is a whole number of roi blocks. Per-roi side data
  (labels, matched gt, ...) is permuted to match — the big (R, oh, ow, C)
  feature tensor is never permuted back (a row gather of it runs at
  ~26 GB/s on this chip; permuting the small targets is free).
* The separable interpolation operators By (oh, Hl) / Bx (ow, Wl) are
  built ON THE XLA SIDE, vectorized over all roi slots, and fed to the
  kernel as blocked bf16 inputs. v1 built them in-kernel from 2-D iota;
  the ablation priced that VPU work at ~1.8 ms/call — XLA builds them
  fused and batched for ~0.1 ms.
* All levels are packed into one zero-padded HBM canvas
  (B, nc, ROWS, Wmax*cb), channel-slab-major. The kernel walks roi
  blocks sequentially (TPU grid is a sequential loop); the current
  level's slab lives in ONE manually-DMA'd VMEM scratch and is
  re-loaded at most L times per (image, slab) pass — each roi is
  computed ONCE, at its own level (the one-hot form pays ~1.33x the
  finest level for EVERY roi).
* Every MXU contraction is bf16 x bf16 with f32 accumulation. v1 ran
  the per-roi contractions in f32 (1/8 MXU rate) — the single largest
  cost in the ablation.
* No in-kernel transposes (v1 paid ~1.5 ms/call in per-roi relayouts):
  - fwd stores each roi's result in its natural (ow, oh, cb) matmul
    order; XLA un-transposes the small output outside the kernel.
  - bwd consumes the cotangent in the fwd kernel's own x-major block
    layout (no XLA relayout), runs the K=ow per-roi matmul in bf16 and
    keeps one per-roi (Wl, oh, cb) -> (oh, Wl, cb) relayout (a rank-3
    row move Mosaic cannot absorb into any matmul ordering — every
    alternative formulation needs an equivalent relayout elsewhere);
    the fat final matmul contracts rb*oh rows into a (Hl, Wmax*cb) f32
    accumulator flushed once per (level, slab) — total bwd HBM traffic
    ~0.3 GB vs ~7 GB for the dense form's intermediates.

Numerics: torchvision roi_align aligned=False/True semantics, identical
to ops/roi_align.py (golden-tested in tests/test_roi_align_sorted.py).
Reference: MultiScaleRoIAlign + roi_align C++/CUDA
(net/network_files/faster_rcnn_framework.py:325-329, roi_head.py:6,106).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instancesegmentation_tpu.ops.roi_align import fpn_level_assignment


# ---------------------------------------------------------------------------
# static geometry of the packed canvas
# ---------------------------------------------------------------------------

class CanvasSpec(NamedTuple):
    hs: Tuple[int, ...]          # per-level feature heights
    ws: Tuple[int, ...]          # per-level feature widths
    row_off: Tuple[int, ...]     # per-level row offset in the canvas
    rows: int                    # canvas rows (incl. tail pad for the DMA)
    sh: int                      # scratch slab height (= max level H, pad8)
    wmax: int                    # canvas cell width (= max level W, pad8)
    c: int                       # channels
    cb: int                      # channel slab
    nc: int                      # number of channel slabs


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _auto_cb(sh: int, wmax: int, c: int, oh: int, rb: int) -> int:
    """Widest 128-multiple channel slab whose kernel working sets fit VMEM.

    One slab for all 256 channels (nc=1) beats two 128-channel passes
    twice over: the canvas pack's (B, rows, W, nc, cb) -> (B, nc, ...)
    transpose becomes layout-free (nc=1 axis moves are free, XLA elides
    the relayout copy — it was ~2 ms/call on the b8 544^2 inference
    graph), and the grid halves, halving slab DMAs and the per-roi
    x-contraction dispatch count. Budget = the larger of the fwd
    (bf16 slab + f32 tmp) and bwd (f32 dslab + compute-dtype dtmp)
    resident sets against a 48 MB cap (the pallas_call limit is 64 MB;
    headroom for double-buffered by/bx/g/out blocks). 544^2 Mask R-CNN
    canvases pick 256; 800-bucket canvases (200x208 P2) keep 128 — their
    f32 bwd accumulator alone would be 42.6 MB at 256."""
    budget = 48 * 1024 * 1024
    cb = c
    while cb > 128:
        if c % cb == 0:
            fwd = sh * wmax * cb * 2 + rb * oh * wmax * cb * 4
            bwd = sh * wmax * cb * 4 + rb * oh * wmax * cb * 2
            if max(fwd, bwd) <= budget:
                return cb
        cb //= 2
    return 128


def make_canvas_spec(shapes: Sequence[Tuple[int, int]], c: int,
                     cb: int | None = None, oh: int = 7,
                     rb: int = 16) -> CanvasSpec:
    hs = tuple(int(h) for h, _ in shapes)
    ws = tuple(int(w) for _, w in shapes)
    sh = _pad8(max(hs))
    wmax = _pad8(max(ws))
    off, offs = 0, []
    for h in hs:
        offs.append(off)
        off += _pad8(h)
    rows = offs[-1] + sh          # last level's SH-row DMA stays in bounds
    if cb is None:
        cb = _auto_cb(sh, wmax, c, oh, rb) if c % 128 == 0 else c
    assert c % cb == 0
    return CanvasSpec(hs, ws, tuple(offs), rows, sh, wmax, c, cb, c // cb)


def pack_fpn_levels(feats: Sequence[jnp.ndarray], spec: CanvasSpec
                    ) -> jnp.ndarray:
    """[(B, Hl, Wl, C)] -> (B, nc, ROWS, Wmax*cb) bf16, zero padded."""
    b = feats[0].shape[0]
    parts = []
    for f, h, w, off in zip(feats, spec.hs, spec.ws, spec.row_off):
        f = f.astype(jnp.bfloat16)
        f = jnp.pad(f, ((0, 0), (0, _pad8(h) - h), (0, spec.wmax - w),
                        (0, 0)))
        parts.append(f)
    canvas = jnp.concatenate(parts, axis=1)            # (B, rows', Wmax, C)
    canvas = jnp.pad(canvas, ((0, 0), (0, spec.rows - canvas.shape[1]),
                              (0, 0), (0, 0)))
    canvas = canvas.reshape(b, spec.rows, spec.wmax, spec.nc, spec.cb)
    return canvas.transpose(0, 3, 1, 2, 4).reshape(
        b, spec.nc, spec.rows, spec.wmax * spec.cb)


# ---------------------------------------------------------------------------
# XLA-side level sort
# ---------------------------------------------------------------------------

class SortedRois(NamedTuple):
    geom: jnp.ndarray         # (B, 6, Rpad) f32 per-slot geometry, fields-major
    block_lvl: jnp.ndarray    # (B, nblocks) i32 level of each roi block
    perm: jnp.ndarray         # (B, Rpad) i32 original roi index per slot
    real: jnp.ndarray         # (B, Rpad) bool slot holds a real roi


GEOM_FIELDS = 6     # [y1c, x1c, bin_h, bin_w, Hl, Wl]


def sort_rois_by_level(rois: jnp.ndarray, spec: CanvasSpec,
                       spatial_scales: Sequence[float], out_size,
                       rb: int, aligned: bool) -> SortedRois:
    """rois (B, R, 4) image-coord xyxy -> level-sorted padded slot tables.

    Rpad = R + L*rb is the static bound: each of the L level segments is
    padded up to whole blocks AND to >= one block (so the backward always
    flushes every level). Pad slots carry their segment's level with zero
    geometry; remaining tail slots go to the last level.
    """
    b, r, _ = rois.shape
    nlvl = len(spec.hs)
    # upper bound on sum_l rb*max(1, ceil(count_l/rb)), block-divisible
    rpad = rb * (-(-r // rb) + nlvl)
    nblocks = rpad // rb
    oh, ow = out_size
    del ow
    scales = jnp.asarray(spatial_scales, jnp.float32)
    hs = jnp.asarray(spec.hs, jnp.float32)
    ws = jnp.asarray(spec.ws, jnp.float32)

    def one(rois_i):
        lvl = fpn_level_assignment(rois_i)                       # (R,)
        order = jnp.argsort(lvl, stable=True)                    # (R,)
        lvl_sorted = lvl[order]
        counts = jnp.bincount(lvl, length=nlvl)                  # (L,)
        seg_blocks = jnp.maximum(1, -(-counts // rb))            # (L,)
        seg_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(seg_blocks * rb)[:-1].astype(jnp.int32)])
        cum_counts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        # slot of sorted roi i: segment start + rank within level
        ranks = jnp.arange(r, dtype=jnp.int32) - cum_counts[lvl_sorted]
        slots = seg_start[lvl_sorted] + ranks                    # (R,)

        perm = jnp.zeros((rpad,), jnp.int32).at[slots].set(order)
        real = jnp.zeros((rpad,), bool).at[slots].set(True)

        # level of every slot: segment s covers
        # [seg_start[s], seg_start[s] + seg_blocks[s]*rb); tail -> last lvl
        slot_idx = jnp.arange(rpad, dtype=jnp.int32)
        seg_end = seg_start + seg_blocks.astype(jnp.int32) * rb
        slot_lvl = jnp.full((rpad,), nlvl - 1, jnp.int32)
        for l in range(nlvl - 1, -1, -1):
            slot_lvl = jnp.where(slot_idx < seg_end[l], l, slot_lvl)
        block_lvl = slot_lvl[::rb]                               # (nblocks,)

        # geometry per slot (zeros for pad slots)
        rs = rois_i[perm] * jnp.where(real, 1.0, 0.0)[:, None]
        sc = scales[slot_lvl]
        shift = 0.5 if aligned else 0.0
        x1 = rs[:, 0] * sc - shift
        y1 = rs[:, 1] * sc - shift
        x2 = rs[:, 2] * sc - shift
        y2 = rs[:, 3] * sc - shift
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw = jnp.maximum(rw, 1.0)
            rh = jnp.maximum(rh, 1.0)
        # fields-major (8, Rpad): SMEM lane-pads the MINOR dim to 128,
        # so the long slot axis must be minor (a (Rpad, 8) table would
        # allocate Rpad*128 lanes and blow the 1 MB SMEM)
        geom = jnp.stack([y1, x1, rh / oh, rw / out_size[1],
                          hs[slot_lvl], ws[slot_lvl]], axis=0)
        return SortedRois(geom, block_lvl, perm, real)

    return jax.vmap(one)(rois)


# ---------------------------------------------------------------------------
# XLA-side interpolation operators (vectorized over all slots)
# ---------------------------------------------------------------------------

def make_operators(geom: jnp.ndarray, spec: CanvasSpec,
                   out_size: Tuple[int, int], s: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """geom (B, 6, Rpad) -> By (B, Rpad, oh, SH), Bx (B, Rpad, ow, WM) bf16.

    By[b, slot, i, h] = mean over the s samples in output bin i of the
    linear interpolation weight on source row h, with torchvision
    validity/clip semantics against the slot's own level height. Built
    here (fused XLA elementwise) rather than in-kernel: the v1 in-kernel
    iota build cost ~1.8 ms/call on the VPU.
    """
    oh, ow = out_size

    def axis_op(start, bin_sz, size, n_src, out_bins):
        # start/bin_sz/size: (B, Rpad)
        j = jnp.arange(out_bins * s, dtype=jnp.float32)          # (obs,)
        bin_i = jnp.floor(j / s)
        off = (j % s + 0.5) / s
        coords = (start[..., None]
                  + (bin_i + off) * bin_sz[..., None])           # (B,R,obs)
        size = size[..., None]
        valid = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1.0)
        c0 = jnp.floor(cc)
        frac = cc - c0
        c0i = c0.astype(jnp.int32)
        c1i = jnp.minimum(c0i + 1, size.astype(jnp.int32) - 1)
        iota = jnp.arange(n_src, dtype=jnp.int32)                # (n_src,)
        mat = ((iota == c0i[..., None]) * (1.0 - frac[..., None])
               + (iota == c1i[..., None]) * frac[..., None]
               ) * valid[..., None]                              # (B,R,obs,n)
        b, rpad = start.shape
        # flat (B, Rpad*out_bins, n_src): kernel blocks are then
        # (1, rb*out_bins, n_src) with no in-kernel reshape (Mosaic
        # cannot shape-cast a (1, rb, oh, SH) block to (rb*oh, SH))
        return jnp.mean(mat.reshape(b, rpad, out_bins, s, n_src),
                        axis=3).reshape(
                            b, rpad * out_bins, n_src).astype(jnp.bfloat16)

    by = axis_op(geom[:, 0], geom[:, 2], geom[:, 4], spec.sh, oh)
    bx = axis_op(geom[:, 1], geom[:, 3], geom[:, 5], spec.wmax, ow)
    return by, bx          # (B, Rpad*oh, SH), (B, Rpad*ow, WM)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(blk_ref, by_ref, bx_ref, canvas_ref, out_ref, slab, loaded,
                sem, *, spec: CanvasSpec, oh: int, ow: int, rb: int,
                cdt):
    """Grid (nc, B, nblocks). slab: VMEM (sh, wmax*cb) bf16 scratch;
    loaded: SMEM (1,) i32 tag of the resident (lvl) slab, -1 = none."""
    ic = pl.program_id(0)
    ib = pl.program_id(1)
    ir = pl.program_id(2)
    # block_lvl crosses the custom_vjp boundary as f32 (an int primal
    # would demand a float0 cotangent); cast back to the scalar int
    lvl = blk_ref[ib, ir].astype(jnp.int32)

    @pl.when(jnp.logical_or(ir == 0, lvl != loaded[0]))
    def _load():
        # offsets are pad8-multiples; select off/8 and multiply back so
        # Mosaic can PROVE the dynamic slice is sublane-tile aligned
        row8 = jnp.int32(0)
        for l in range(len(spec.row_off)):       # scalar select of offset
            row8 = jnp.where(lvl == l, jnp.int32(spec.row_off[l] // 8),
                             row8)
        # pl.multiple_of: at small canvases (eval buckets) Mosaic promotes
        # the ANY-space canvas into VMEM and the copy becomes a
        # tpu.memref_slice, whose start the prover must show is
        # sublane-tile aligned — it cannot see through the select chain
        # even times 8 (observed: "Failed to prove that a tile index in
        # dimension 2 is divisible by the tiling (8)" at 192x128 inputs)
        cp = pltpu.make_async_copy(
            canvas_ref.at[ib, ic,
                          pl.ds(pl.multiple_of(row8 * 8, 8), spec.sh), :],
            slab, sem)
        cp.start()
        cp.wait()
        loaded[0] = lvl

    # cdt = bf16 on TPU MXU; f32 under interpret (XLA:CPU has no
    # bf16 dot thunk on this host)
    by = by_ref[0].astype(cdt)                               # (rb*oh, SH)
    tmp = jnp.dot(by, slab[...].astype(cdt),
                  preferred_element_type=jnp.float32)        # (rb*oh, WM*cb)
    # ONE lane-split retile for the whole block, then per-roi rank-3 row
    # slices (free). 16 per-roi reshapes cost ~1.5 ms/call extra; casting
    # tmp to bf16 costs ~6 ms/call in retiles — measured, keep f32 here.
    tmp3 = tmp.reshape(rb * oh, spec.wmax, spec.cb)
    for r in range(rb):
        o = jax.lax.dot_general(
            bx_ref[0, r * ow:(r + 1) * ow].astype(jnp.float32),
            tmp3[r * oh:(r + 1) * oh],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (ow, oh, cb)
        # natural matmul order (ow, oh, cb); XLA un-transposes outside
        out_ref[0, r] = o.reshape(ow * oh, spec.cb).astype(out_ref.dtype)


def roi_align_sorted_fwd(canvas: jnp.ndarray, by: jnp.ndarray,
                         bx: jnp.ndarray, block_lvl: jnp.ndarray,
                         spec: CanvasSpec, out_size: Tuple[int, int],
                         rb: int, interpret: bool = False) -> jnp.ndarray:
    """canvas (B, nc, rows, wmax*cb); By (B, Rpad, oh, SH); Bx
    (B, Rpad, ow, WM); block_lvl (B, nblocks) -> (B, Rpad, ow*oh, C)
    bf16 in slot order, X-MAJOR within each roi cell."""
    b = canvas.shape[0]
    oh, ow = out_size
    rpad = by.shape[1] // oh
    nblocks = rpad // rb

    kernel = functools.partial(
        _fwd_kernel, spec=spec, oh=oh, ow=ow, rb=rb,
        cdt=jnp.float32 if interpret else jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(spec.nc, b, nblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # block_lvl
            pl.BlockSpec((1, rb * oh, spec.sh),
                         lambda ic, ib, ir: (ib, ir, 0)),
            pl.BlockSpec((1, rb * ow, spec.wmax),
                         lambda ic, ib, ir: (ib, ir, 0)),
            pl.BlockSpec(memory_space=pl.ANY),      # canvas stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, rb, ow * oh, spec.cb),
            lambda ic, ib, ir: (ib, ir, 0, ic)),
        out_shape=jax.ShapeDtypeStruct((b, rpad, ow * oh, spec.c),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((spec.sh, spec.wmax * spec.cb), jnp.bfloat16),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(block_lvl, by, bx, canvas)
    return out


# ---------------------------------------------------------------------------
# backward kernel: dF accumulation in a VMEM-resident slab tile
# ---------------------------------------------------------------------------

def _bwd_kernel(blk_ref, by_ref, bx_ref, g_ref, dcanvas_ref, dslab, dtmp_s,
                loaded, sem, *, spec: CanvasSpec, oh: int, ow: int, rb: int,
                nblocks: int, cdt):
    """Grid (nc, B, nblocks). g_ref block: (1, rb, ow*oh, cb) bf16 —
    the fwd kernel's own x-major output layout. dslab: VMEM
    (sh, wmax*cb) f32 accumulator. Flushes to dcanvas (ANY/HBM) when the
    level changes or the walk ends. Levels are ascending within an
    (ic, ib) pass and every level owns >= 1 block, so each level's own
    rows are written last."""
    ic = pl.program_id(0)
    ib = pl.program_id(1)
    ir = pl.program_id(2)
    lvl = blk_ref[ib, ir].astype(jnp.int32)

    def row_off8_of(l_scalar):
        """Level row offset, asserted 8-aligned (pl.multiple_of) so Mosaic
        can prove sublane-tile alignment of the dynamic index even when it
        cannot see through the select chain (VMEM-promoted dcanvas)."""
        row8 = jnp.int32(0)
        for l in range(len(spec.row_off)):
            row8 = jnp.where(l_scalar == l, jnp.int32(spec.row_off[l] // 8),
                             row8)
        return pl.multiple_of(row8 * 8, 8)

    @pl.when(jnp.logical_and(ir == 0, jnp.logical_and(ic == 0, ib == 0)))
    def _init_tag():
        loaded[0] = -1

    # flush the previous level's accumulator before switching
    prev = loaded[0]

    @pl.when(jnp.logical_and(prev >= 0, prev != lvl))
    def _flush_prev():
        cp = pltpu.make_async_copy(
            dslab, dcanvas_ref.at[ib, ic,
                                  pl.ds(row_off8_of(prev), spec.sh),
                                  :], sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_or(ir == 0, prev != lvl))
    def _zero():
        dslab[...] = jnp.zeros_like(dslab)
        loaded[0] = lvl

    # per roi: t[w, y, c] = sum_x Bx_r[x, w] * g_r[x, y, c] (K = ow,
    # bf16), then the one unavoidable relayout to dtmp rows (y, (w,c))
    for r in range(rb):
        g_r = g_ref[0, r].astype(cdt).reshape(ow, oh, spec.cb)
        t = jax.lax.dot_general(
            bx_ref[0, r * ow:(r + 1) * ow].astype(cdt), g_r,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (WM, oh, cb)
        dtmp_s[r * oh:(r + 1) * oh] = jnp.transpose(t, (1, 0, 2)).reshape(
            oh, spec.wmax * spec.cb).astype(dtmp_s.dtype)

    # dslab (h, (w,c)) += sum_{r,y} By[(r,y), h] * dtmp[(r,y), (w,c)]
    # — one fat MXU matmul contracting rb*oh
    by = by_ref[0].astype(cdt)                               # (rb*oh, SH)
    dslab[...] = dslab[...] + jax.lax.dot_general(
        by, dtmp_s[...].astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ir == nblocks - 1)
    def _flush_last():
        cp = pltpu.make_async_copy(
            dslab, dcanvas_ref.at[ib, ic,
                                  pl.ds(row_off8_of(lvl), spec.sh),
                                  :], sem)
        cp.start()
        cp.wait()
        loaded[0] = -1


def roi_align_sorted_bwd(g: jnp.ndarray, by: jnp.ndarray, bx: jnp.ndarray,
                         block_lvl: jnp.ndarray, spec: CanvasSpec,
                         out_size: Tuple[int, int], rb: int,
                         interpret: bool = False) -> jnp.ndarray:
    """g (B, Rpad, ow*oh, C) -> dcanvas (B, nc, rows, wmax*cb) f32."""
    b, rpad = g.shape[:2]
    nblocks = rpad // rb
    oh, ow = out_size
    cdt = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(
        _bwd_kernel, spec=spec, oh=oh, ow=ow, rb=rb, nblocks=nblocks,
        cdt=cdt)
    dcanvas = pl.pallas_call(
        kernel,
        grid=(spec.nc, b, nblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # block_lvl
            pl.BlockSpec((1, rb * oh, spec.sh),
                         lambda ic, ib, ir: (ib, ir, 0)),
            pl.BlockSpec((1, rb * ow, spec.wmax),
                         lambda ic, ib, ir: (ib, ir, 0)),
            pl.BlockSpec((1, rb, ow * oh, spec.cb),
                         lambda ic, ib, ir: (ib, ir, 0, ic)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (b, spec.nc, spec.rows, spec.wmax * spec.cb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((spec.sh, spec.wmax * spec.cb), jnp.float32),
            pltpu.VMEM((rb * oh, spec.wmax * spec.cb), cdt),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(block_lvl, by, bx, g)
    return dcanvas


def unpack_dcanvas(dcanvas: jnp.ndarray, spec: CanvasSpec, dtype
                   ) -> Tuple[jnp.ndarray, ...]:
    """(B, nc, rows, wmax*cb) f32 -> per-level (B, Hl, Wl, C) grads."""
    b = dcanvas.shape[0]
    full = dcanvas.reshape(b, spec.nc, spec.rows, spec.wmax, spec.cb)
    full = full.transpose(0, 2, 3, 1, 4).reshape(
        b, spec.rows, spec.wmax, spec.c)
    outs = []
    for h, w, off in zip(spec.hs, spec.ws, spec.row_off):
        outs.append(full[:, off:off + h, :w].astype(dtype))
    return tuple(outs)


# ---------------------------------------------------------------------------
# differentiable multiscale wrapper
# ---------------------------------------------------------------------------

DEFAULT_RB = 16


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _sorted_align(feats, by, bx, block_lvl, marker, spec, out_size, rb,
                  interpret):
    canvas = pack_fpn_levels(feats, spec)
    del marker
    return roi_align_sorted_fwd(canvas, by, bx, block_lvl, spec, out_size,
                                rb, interpret=interpret)


def _sorted_align_fwd(feats, by, bx, block_lvl, marker, spec, out_size, rb,
                      interpret):
    out = _sorted_align(feats, by, bx, block_lvl, marker, spec, out_size,
                        rb, interpret)
    return out, (by, bx, block_lvl, marker)


def _sorted_align_bwd(spec, out_size, rb, interpret, residual, g):
    by, bx, block_lvl, marker = residual
    dcanvas = roi_align_sorted_bwd(g.astype(jnp.bfloat16), by, bx,
                                   block_lvl, spec, out_size, rb,
                                   interpret=interpret)
    dfeats = unpack_dcanvas(dcanvas, spec, marker.dtype)
    return (dfeats, jnp.zeros_like(by), jnp.zeros_like(bx),
            jnp.zeros_like(block_lvl), jnp.zeros_like(marker))


_sorted_align.defvjp(_sorted_align_fwd, _sorted_align_bwd)


class SortedAlign(NamedTuple):
    feats: jnp.ndarray        # (B, Rpad, oh, ow, C) bf16, slot order
                              # ((B, Rpad, ow, oh, C) when xmajor=True)
    perm: jnp.ndarray         # (B, Rpad) original roi index per slot
    real: jnp.ndarray         # (B, Rpad) bool


def multiscale_roi_align_sorted(feats: Sequence[jnp.ndarray],
                                rois: jnp.ndarray,
                                out_size: Tuple[int, int],
                                spatial_scales: Sequence[float],
                                sampling_ratio: int = 2,
                                aligned: bool = False,
                                rb: int = DEFAULT_RB,
                                interpret: bool = False,
                                xmajor: bool = False) -> SortedAlign:
    """Batched MultiScaleRoIAlign, each roi computed once at its level.

    feats: [(B, Hl, Wl, C)] P2..P5; rois (B, R, 4) image-coord xyxy.
    Returns roi features in LEVEL-SORTED slot order plus the slot->roi
    permutation: permute the per-roi side data (labels, boxes, ...) with
    ``jnp.take_along_axis(x, out.perm, axis=1)`` and mask with
    ``out.real`` instead of un-permuting the features.

    ``xmajor=True`` returns the kernel's NATIVE (ow, oh) cell order and
    skips the (oh, ow) un-transpose — on the b8 544² inference graph the
    un-transpose is ~2 ms/call of pure HBM relayout (215 MB feature
    tensor); a consumer that contracts both spatial dims anyway (the box
    head's _FlattenDense) folds the swap into its matmul operand load
    for free (PERF_NOTES round-5 floor table).
    """
    spec = make_canvas_spec([f.shape[1:3] for f in feats],
                            feats[0].shape[-1], oh=out_size[0], rb=rb)
    srt = sort_rois_by_level(rois, spec, spatial_scales, out_size, rb,
                             aligned)
    by, bx = make_operators(srt.geom, spec, out_size, sampling_ratio)
    marker = jnp.zeros((0,), feats[0].dtype)
    out = _sorted_align(tuple(feats), by, bx,
                        srt.block_lvl.astype(jnp.float32), marker, spec,
                        tuple(out_size), rb, interpret)
    oh, ow = out_size
    b, rpad = out.shape[0], out.shape[1]
    # kernel emits x-major (ow, oh) cells; un-transpose the small output
    # unless the caller consumes x-major directly
    out = out.reshape(b, rpad, ow, oh, spec.c)
    if not xmajor:
        out = out.swapaxes(2, 3)
    out = out * srt.real[:, :, None, None, None].astype(out.dtype)
    return SortedAlign(out, srt.perm, srt.real)
