"""Bucketed data loader: shuffling, worker threads, prefetch.

The host input pipeline (SURVEY §2.2 last row): decode + augment in Python
worker threads (PIL releases the GIL for decode/resize), group augmented
images by shape bucket, and emit fixed-shape numpy batches the jitted step
consumes without recompiles.  Equivalent role to the reference's
``DataLoader(num_workers=2, collate_fn=get_collate_function())`` stack
(reference detr/train.py:149-166) with the ragged collate replaced by
bucket assembly.

Batching policy: per-bucket accumulation — a batch is emitted when its
bucket fills (standard bucketing; batches are shape-homogeneous).  Training
drops epoch-end remainders like the reference's ``drop_last=True``
(train.py:154); eval pads the final short batch by repeating the last item
and reports the true count via ``pad_count``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from detr_tpu.data.bucketing import (
    DEFAULT_BUCKETS,
    EVAL_BUCKETS,
    assemble_batch,
    fit_to_bucket,
    pick_bucket,
)


class BucketedLoader:
    """Iterates fixed-shape batches over a (dataset, transform) pair.

    Args:
      dataset: indexable returning (image ndarray/PIL, target dict) —
        detr_tpu.data.coco.CocoDataset or compatible.
      batch_size: images per emitted batch.
      buckets: (H, W) shape buckets; a single bucket gives eval-style
        fixed-shape batching.
      shuffle / drop_last: reference DataLoader semantics (train.py:149-166).
      num_workers: decode+augment threads (0 = synchronous).
      seed: shuffle seed; advanced every epoch.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        buckets: Sequence[tuple[int, int]] = DEFAULT_BUCKETS,
        max_gt: int = 100,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 2,
        seed: int = 0,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        # Upper bound: with drop_last, up to batch_size-1 items per bucket are
        # dropped each epoch, so the true count is data-dependent (and, with
        # random multi-scale transforms, varies per epoch) within
        # [len - n_buckets, len].  Nothing load-bearing consumes this — the LR
        # schedule is epoch-indexed and injected per epoch by the trainer
        # (train/optimizer.py), not derived from a step count.
        return len(self.dataset) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def _load_item(self, i: int):
        img, target = self.dataset[int(i)]
        img = np.asarray(img)
        bucket_id = pick_bucket(img.shape[0], img.shape[1], self.buckets)
        img, target = fit_to_bucket(img, target, self.buckets[bucket_id])
        return bucket_id, (img, target)

    def _item_stream(self, indices) -> Iterator:
        if self.num_workers <= 0:
            for i in indices:
                yield self._load_item(i)
            return

        in_q: queue.Queue = queue.Queue()
        out_q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, 1) * self.batch_size)
        for pos, i in enumerate(indices):
            in_q.put((pos, i))
        stop = object()

        def worker():
            while True:
                try:
                    pos, i = in_q.get_nowait()
                except queue.Empty:
                    out_q.put(stop)
                    return
                try:
                    out_q.put((pos, self._load_item(i)))
                except Exception as e:  # surface loader errors, don't hang
                    out_q.put((pos, e))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        finished = 0
        pending: dict[int, object] = {}
        next_pos = 0
        served = 0
        total = len(indices)
        while served < total:
            item = out_q.get()
            if item is stop:
                finished += 1
                continue
            pos, payload = item
            pending[pos] = payload
            # deterministic order: serve in index order
            while next_pos in pending:
                payload = pending.pop(next_pos)
                next_pos += 1
                served += 1
                if isinstance(payload, Exception):
                    raise payload
                yield payload

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        indices = self._indices()
        self.epoch += 1
        pools: dict[int, list] = {i: [] for i in range(len(self.buckets))}
        for bucket_id, item in self._item_stream(indices):
            pools[bucket_id].append(item)
            if len(pools[bucket_id]) == self.batch_size:
                batch = assemble_batch(
                    pools[bucket_id], self.buckets[bucket_id], self.max_gt
                )
                batch["pad_count"] = np.int32(0)
                batch["image_valid"] = np.ones(self.batch_size, bool)
                pools[bucket_id] = []
                yield batch
        if not self.drop_last:
            for bucket_id, items in pools.items():
                if not items:
                    continue
                pad = self.batch_size - len(items)
                items = items + [items[-1]] * pad
                batch = assemble_batch(
                    items, self.buckets[bucket_id], self.max_gt
                )
                batch["pad_count"] = np.int32(pad)
                # Padded (repeated) images are excluded from the loss by the
                # criterion and from detections by the metrics adapter.
                image_valid = np.ones(self.batch_size, bool)
                if pad:
                    image_valid[-pad:] = False
                batch["image_valid"] = image_valid
                yield batch


def make_eval_loader(
    dataset,
    batch_size: int,
    max_gt: int = 100,
    num_workers: int = 2,
    shape: tuple[int, int] | None = None,
):
    """Fixed eval shape(s) (reference val transform: 800/1333 -> padded to

    (800, 1344), detr/data.py:66-83 + collate /32 rounding).  ``shape`` is the
    landscape (H, W) to compile for (``TrainingConfig.eval_shape``); its
    transpose is added so portrait images are not downscaled.  None keeps the
    default eval buckets."""
    if shape is None:
        buckets = EVAL_BUCKETS
    else:
        h, w = tuple(shape)
        buckets = ((h, w),) if h == w else ((h, w), (w, h))
    return BucketedLoader(
        dataset,
        batch_size,
        buckets=buckets,
        max_gt=max_gt,
        shuffle=False,
        drop_last=False,
        num_workers=num_workers,
    )
