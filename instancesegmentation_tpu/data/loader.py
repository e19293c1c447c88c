"""Fixed-shape batch collation + threaded prefetching loader.

TPU-native replacement for the reference's DataLoader+collate stack
(models/init_model.py:88-136, inst_model/yolact/utils/dataloader.py:80-92):
instead of ragged per-image lists, every batch is a dict of fixed-shape
numpy arrays (instances padded to ``max_instances`` with validity masks) so
one jitted train step serves the whole run with zero recompiles.

Masks are pre-downsampled on host to the loss resolution (YOLACT: proto
resolution — see models/yolact/loss.py docstring) so the device never sees
(B, M, 544, 544) tensors it would immediately shrink.

Images ship as RAW uint8 RGB — a 4x H2D byte cut vs the reference's
normalized-f32 boundary (models/script.py:163-166); the mean/std affine
runs inside the jitted step (ops/preprocess.py). Quantizing the augmented
float image back to 8 bits (round + clip) perturbs pixels by at most
0.5/58 ≈ 0.9% of one normalized std — measured loss-curve delta on a
same-seed smoke run is noise-level (docs/PERF_NOTES.md "uint8 H2D").
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np

from instancesegmentation_tpu.ops.preprocess import (IMAGENET_MEAN,
                                                     IMAGENET_STD)


def quantize_uint8(image: np.ndarray) -> np.ndarray:
    """Float 0-255 image -> uint8 (round, clip). The augmentation pipeline
    can push values slightly outside [0, 255] (brightness/contrast,
    augment.py:39-64, unclamped in the reference too); clipping those
    tails is part of the documented 8-bit boundary deviation."""
    if image.dtype == np.uint8:
        return image
    return np.clip(np.rint(image), 0, 255).astype(np.uint8)


class YolactCollate:
    """Pad/stack samples for the YOLACT train/eval step."""

    def __init__(self, max_instances: int = 64,
                 mask_hw: Optional[Tuple[int, int]] = (136, 136)):
        self.max_instances = max_instances
        self.mask_hw = mask_hw

    def _downsample_masks(self, masks: np.ndarray) -> np.ndarray:
        import cv2
        if self.mask_hw is None or masks.shape[0] == 0:
            return masks
        oh, ow = self.mask_hw
        if masks.shape[1:] == (oh, ow):
            return masks
        # float bilinear then >0.5: the reference's in-loss downsample
        # (yolact_training.py:272-274) moved to host
        out = np.stack([
            cv2.resize(m.astype(np.float32), (ow, oh),
                       interpolation=cv2.INTER_LINEAR) > 0.5
            for m in masks])
        return out.astype(np.uint8)

    def __call__(self, samples) -> Dict[str, np.ndarray]:
        b = len(samples)
        m = self.max_instances
        h, w = samples[0]["image"].shape[:2]
        if self.mask_hw is not None:
            mh, mw = self.mask_hw
        else:
            mh, mw = h, w

        images = np.zeros((b, h, w, 3), np.uint8)
        boxes = np.zeros((b, m, 4), np.float32)
        labels = np.zeros((b, m), np.int32)
        masks = np.zeros((b, m, mh, mw), np.uint8)
        valid = np.zeros((b, m), bool)
        is_crowd = np.zeros((b, m), bool)
        image_ids = np.zeros((b,), np.int64)

        for i, s in enumerate(samples):
            images[i] = quantize_uint8(s["image"])
            n = min(len(s["labels"]), m)
            if n:
                boxes[i, :n] = s["boxes"][:n]
                labels[i, :n] = s["labels"][:n]
                masks[i, :n] = self._downsample_masks(s["masks"][:n])
                valid[i, :n] = True
                is_crowd[i, :n] = s["is_crowd"][:n]
            image_ids[i] = s["image_id"]
        return {"image": images, "boxes": boxes, "labels": labels,
                "masks": masks, "valid": valid, "is_crowd": is_crowd,
                "image_id": image_ids}


class RcnnCollate(YolactCollate):
    """Mask R-CNN batch: gt masks stay at IMAGE resolution (the mask loss
    projects them onto rois with 28x28 roi_align, roi_head.py:94-146).
    Images ship uint8 like YolactCollate; the reference's DOUBLE
    normalization — preprocess_input at the dataset level
    (inst_model/Mask_RCNN/utils/dataloader.py:214) followed by
    GeneralizedRCNNTransform's ImageNet normalize
    (faster_rcnn_framework.py:356-361), an affine quirk kept for
    training-dynamics parity — is folded into one fused mean/std applied
    on device (ops/preprocess.py RCNN_MEAN/RCNN_STD)."""

    # kept as class attrs for existing callers (tools/box_head_oracle.py)
    IMAGENET_MEAN = IMAGENET_MEAN
    IMAGENET_STD = IMAGENET_STD

    def __init__(self, max_instances: int = 48):
        super().__init__(max_instances, mask_hw=None)

    def __call__(self, samples):
        batch = super().__call__(samples)
        # bit-pack the image-resolution gt masks (8x H2D cut, exact);
        # the jitted step unpacks on device (ops/preprocess.py)
        from instancesegmentation_tpu.ops.preprocess import pack_mask_bits
        batch["masks"] = pack_mask_bits(batch["masks"])
        return batch


_POOL: Optional[ThreadPoolExecutor] = None
_POOL_SIZE = 0
_POOL_LOCK = threading.Lock()


def _shared_pool(num_workers: int) -> ThreadPoolExecutor:
    """Process-wide decode/augment pool, created once and reused across
    epochs and Loader instances. The trainer builds fresh loaders every
    epoch (reference trainer.py:202-207 does the same); spinning up a new
    ThreadPoolExecutor each time paid thread create/join per epoch
    (round-3 advisor finding). Grow-only: a larger request swaps in a
    bigger pool and lets the old one drain its in-flight work —
    shutdown(wait=False) cancels nothing already submitted, it only
    rejects NEW submits, which producers handle by re-fetching the
    current pool (see the retry in Loader.epoch)."""
    global _POOL, _POOL_SIZE
    with _POOL_LOCK:
        if _POOL is None or _POOL_SIZE < num_workers:
            old = _POOL
            _POOL = ThreadPoolExecutor(num_workers,
                                       thread_name_prefix="instseg-loader")
            _POOL_SIZE = num_workers
            if old is not None:
                old.shutdown(wait=False)
        return _POOL


class Loader:
    """Shuffling, epoch-based loader with background worker threads.

    The reference uses torch DataLoader worker processes
    (models/init_model.py:127-136); here a shared thread pool
    decodes/augments (cv2/numpy release the GIL for the heavy parts) and a
    bounded queue keeps `prefetch` batches ready for the device.
    """

    def __init__(self, dataset, batch_size: int, collate: Callable,
                 shuffle: bool = True, seed: int = 704,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 2, batch_sampler=None,
                 num_shards: int = 1, shard_index: int = 0):
        """``batch_sampler``: optional object with epoch(e) -> list of index
        lists (e.g. data.aspect_ratio.GroupedBatchSampler), replacing the
        default shuffled contiguous batching.

        ``num_shards``/``shard_index``: per-process input sharding (the
        DistributedSampler analogue, models/init_model.py:88-92).
        ``batch_size`` stays the GLOBAL batch; every process computes the
        same deterministic global batch composition (same seed/shuffle)
        but decodes/augments only its own CONTIGUOUS slice of each batch
        — rank r gets rows [r*B/P, (r+1)*B/P), so the rank-order
        concatenation of local batches IS the global batch and
        parallel.mesh.shard_batch can assemble it without reshuffling
        (contiguous matches the mesh's process-ordered device layout).
        Ragged trailing batches (drop_last=False) are skipped when
        sharded: multi-process SPMD needs equal shapes on every rank."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.batch_sampler = batch_sampler
        if not 0 <= shard_index < num_shards:
            raise ValueError(f"shard_index {shard_index} out of range for "
                             f"num_shards {num_shards}")
        if num_shards > 1 and batch_size % num_shards:
            # fail loudly at construction: every default-path batch is
            # full-size (drop_last), so a non-divisible batch_size would
            # otherwise make _shard_entry skip EVERY batch and the epoch
            # silently yield nothing (round-5 review finding)
            raise ValueError(f"global batch_size {batch_size} must divide "
                             f"evenly across {num_shards} process shards")
        self.num_shards = num_shards
        self.shard_index = shard_index

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        return idx

    def _shard_entry(self, entry):
        """Slice one global batch entry down to this process's rows."""
        out_hw, idxs = entry if isinstance(entry, tuple) else (None, entry)
        n = len(idxs)
        if n % self.num_shards:
            return None                    # ragged batch: skip (see __init__)
        per = n // self.num_shards
        local = idxs[self.shard_index * per:(self.shard_index + 1) * per]
        return (out_hw, local) if out_hw is not None else local

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        if self.batch_sampler is not None:
            batches = self.batch_sampler.epoch(epoch)
        else:
            idx = self._epoch_indices(epoch)
            batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(len(self))]
        if self.num_shards > 1:
            batches = [s for b in batches
                       if (s := self._shard_entry(b)) is not None]
        nb = len(batches)

        def make_batch(bi: int):
            entry = batches[bi]
            # bucket samplers yield (out_hw, indices); plain ones a list
            out_hw, idxs = entry if isinstance(entry, tuple) else (None, entry)
            samples = []
            for j, di in enumerate(idxs):
                rng = np.random.default_rng(
                    (self.seed * 1_000_003 + epoch * 7919 + int(di)) % (2**63))
                samples.append(self.dataset.get_item(int(di), rng,
                                                     out_hw=out_hw))
            return self.collate(samples)

        if self.num_workers <= 1:
            for bi in range(nb):
                yield make_batch(bi)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that keeps observing stop: a plain q.put blocks
            forever once the consumer abandons the epoch (review finding —
            leaked producer + workers + prefetched batches per truncated
            epoch, e.g. every --smoke run)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                from collections import deque
                window = self.num_workers + self.prefetch
                pool = _shared_pool(self.num_workers)
                inflight: deque = deque()
                nxt = 0
                retries = 0
                while nxt < nb or inflight:
                    while nxt < nb and len(inflight) < window:
                        try:
                            inflight.append(pool.submit(make_batch, nxt))
                        except RuntimeError:
                            # another Loader grew the shared pool and shut
                            # this one down mid-epoch; in-flight futures
                            # still complete — re-fetch and resubmit.
                            # Bounded: a submit that keeps failing for any
                            # other reason (e.g. interpreter shutdown, where
                            # re-creating the pool raises the same error)
                            # must not spin forever (round-4 advisor).
                            retries += 1
                            if retries > 8:
                                raise
                            pool = _shared_pool(self.num_workers)
                            continue
                        retries = 0
                        nxt += 1
                    if not put_or_stop(inflight.popleft().result()):
                        return
            except BaseException as e:  # surface worker errors to consumer
                put_or_stop(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            for _ in range(nb):
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
