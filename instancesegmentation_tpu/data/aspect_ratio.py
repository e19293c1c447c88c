"""Aspect-ratio-grouped batching.

Port of the reference's GroupedBatchSampler stack
(/root/reference/utils/utils.py:65-251: quantize w/h ratios into 2k+1 bins
over [1/2, 2], draw each batch from one bin, deterministic length via
repeat-fill). The reference wires it only for Mask R-CNN
(models/init_model.py:98-125) to bound padding waste under variable-size
batching; with this framework's fixed square resize it is a no-op for the
default configs, but it becomes load-bearing the moment multi-bucket
resolutions are enabled, so it ships as a first-class sampler.
"""

from __future__ import annotations

import bisect
import math
from collections import defaultdict
from typing import List, Sequence

import numpy as np


def compute_aspect_ratios(dataset) -> List[float]:
    """w/h per image, from COCO metadata (no decode — utils/utils.py:
    get_height_and_width fast path)."""
    out = []
    for image_id in dataset.ids:
        info = dataset.coco.loadImgs(image_id)[0]
        out.append(info["width"] / info["height"])
    return out


def create_aspect_ratio_groups(dataset, k: int = 0) -> List[int]:
    """Group id per sample: 2k+1 log-spaced bins over [0.5, 2]
    (utils/utils.py:237-251)."""
    aspect_ratios = compute_aspect_ratios(dataset)
    bins = (2 ** np.linspace(-1, 1, 2 * k + 1)).tolist() if k > 0 else [1.0]
    groups = [bisect.bisect_right(bins, r) for r in aspect_ratios]
    counts = np.bincount(groups, minlength=len(bins) + 1)
    fbins = [0] + bins + [np.inf]
    print(f"Using {fbins} as bins for aspect ratio quantization")
    print(f"Count of instances per bin: {list(counts)}")
    return groups


class GroupedBatchSampler:
    """Yield index batches where every element is from one ratio group;
    groups short of a full batch at epoch end are repeat-filled from their
    own tail so every epoch has the same number of batches
    (utils/utils.py:73-134)."""

    def __init__(self, group_ids: Sequence[int], batch_size: int,
                 seed: int = 704):
        self.group_ids = list(group_ids)
        self.batch_size = batch_size
        self.seed = seed

    def __len__(self):
        return math.ceil(len(self.group_ids) / self.batch_size)

    def epoch(self, epoch: int = 0) -> List[List[int]]:
        order = np.arange(len(self.group_ids))
        np.random.RandomState(self.seed + epoch).shuffle(order)

        buffers = defaultdict(list)
        seen = defaultdict(list)
        batches: List[List[int]] = []
        for idx in order:
            g = self.group_ids[idx]
            buffers[g].append(int(idx))
            seen[g].append(int(idx))
            if len(buffers[g]) == self.batch_size:
                batches.append(buffers.pop(g))

        # repeat-fill remaining partial groups (reference :118-133)
        target = len(self)
        for g, buf in sorted(buffers.items()):
            if len(batches) >= target:
                break
            pool = seen[g]
            while len(buf) < self.batch_size:
                buf.append(pool[len(buf) % len(pool)])
            batches.append(buf)
        return batches[:target]


def nearest_bucket(h: int, w: int,
                   buckets: Sequence[Sequence[int]]) -> tuple:
    """The bucket (H, W) whose aspect ratio best matches an h x w image
    (|log(w/h) - log(W/H)| — the same rule assign_resolution_buckets uses
    for training, applied per image at eval/predict time so train and
    inference geometry match, as GeneralizedRCNNTransform does for both
    paths: reference transform.py:256-301 train, :362 inference)."""
    r = np.log(w / h)
    bucket_ratios = np.log([b[1] / b[0] for b in buckets])
    return tuple(int(x) for x in buckets[int(np.argmin(np.abs(r - bucket_ratios)))])


def assign_resolution_buckets(dataset,
                              buckets: Sequence[Sequence[int]]) -> List[int]:
    """Bucket index per sample: nearest bucket by |log aspect ratio|.

    The bucket list is the static-shape analogue of the reference's
    min800/max1333 dynamic resize (transform.py:256-386): each image maps
    to the bucket whose H/W ratio best matches, minimizing pad waste."""
    ratios = compute_aspect_ratios(dataset)                     # w/h
    bucket_ratios = np.log([b[1] / b[0] for b in buckets])      # w/h per bucket
    idx = [int(np.argmin(np.abs(np.log(r) - bucket_ratios))) for r in ratios]
    counts = np.bincount(idx, minlength=len(buckets))
    print(f"Resolution buckets {list(map(tuple, buckets))}: "
          f"counts per bucket {list(counts)}")
    return idx


class BucketBatchSampler(GroupedBatchSampler):
    """GroupedBatchSampler whose groups are resolution buckets; every
    yielded batch carries its bucket's (H, W) so the loader can resize+pad
    each sample to the batch's static shape (one compiled step per bucket)."""

    def __init__(self, dataset, buckets: Sequence[Sequence[int]],
                 batch_size: int, seed: int = 704):
        self.buckets = [tuple(int(x) for x in b) for b in buckets]
        group_ids = assign_resolution_buckets(dataset, self.buckets)
        super().__init__(group_ids, batch_size, seed=seed)

    def epoch(self, epoch: int = 0):
        batches = super().epoch(epoch)
        out = []
        for batch in batches:
            hw = self.buckets[self.group_ids[batch[0]]]
            out.append((hw, batch))
        return out
