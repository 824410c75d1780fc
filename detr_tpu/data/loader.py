"""Bucketed data loader: shuffling, worker processes/threads, prefetch.

The host input pipeline (SURVEY §2.2 last row): decode + augment in worker
processes (default — the augmentation chain is numpy-bound and the GIL
makes threads scale NEGATIVELY: measured 14.6 img/s at 0 workers vs 11.3 at
8 threads), group augmented images by shape bucket, and emit fixed-shape
numpy batches the jitted step consumes without recompiles.  Equivalent role
to the reference's ``DataLoader(num_workers=2, collate_fn=...)`` stack
(reference detr/train.py:149-166; torch also uses worker processes) with
the ragged collate replaced by bucket assembly.

Process workers need a picklable ``(dataset)``; when pickling fails (e.g. a
locally-defined test wrapper) the loader falls back to threads, which is
also the explicit choice via ``worker_mode="thread"``.

Batching policy: per-bucket accumulation — a batch is emitted when its
bucket fills (standard bucketing; batches are shape-homogeneous).  Training
drops epoch-end remainders like the reference's ``drop_last=True``
(train.py:154); eval pads the final short batch by repeating the last item
and reports the true count via ``pad_count``.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from detr_tpu.data.bucketing import (
    DEFAULT_BUCKETS,
    EVAL_BUCKETS,
    assemble_batch,
    assemble_batch_source,
    derive_source_buckets,
    fit_to_bucket,
    fit_to_bucket_source,
    pick_bucket,
)

# ---- process-worker plumbing (module-level so "spawn" can import it) ----

_WORKER_DATASET = None
_WORKER_BUCKETS = None
_WORKER_SOURCE_BUCKETS = None  # None = target wire; set = device-resize wire


def _pool_init(dataset, buckets, base_seed, counter, source_buckets=None):
    global _WORKER_DATASET, _WORKER_BUCKETS, _WORKER_SOURCE_BUCKETS
    _WORKER_DATASET = dataset
    _WORKER_BUCKETS = buckets
    _WORKER_SOURCE_BUCKETS = source_buckets
    # Every worker unpickles an identical dataset copy — identical transform
    # RNG states would replay the same augmentation stream in each worker.
    # Datasets expose set_worker_seed to decorrelate (CocoDataset does).
    # Seeds derive from (loader seed, worker index) via a shared atomic
    # counter — the seed SET {base..base+n-1} is deterministic run-to-run
    # (which worker draws which index from the pool scheduler is not, so
    # per-image augmentation under >1 worker is decorrelated but not
    # bit-reproducible; num_workers=0 is the bit-reproducible mode).
    if hasattr(dataset, "set_worker_seed"):
        with counter.get_lock():
            idx = counter.value
            counter.value += 1
        dataset.set_worker_seed(int(base_seed) + idx)


def _pool_probe() -> bool:
    return _WORKER_DATASET is not None


def _load_fitted(dataset, i, buckets, source_buckets):
    """Shared item path for both wires: load, pick bucket, fit."""
    img, target = dataset[int(i)]
    img = np.asarray(img)
    if source_buckets is not None:
        th, tw = target["resize_to"]  # device-resize wire: bucket by TARGET
        bucket_id = pick_bucket(th, tw, buckets)
        img, target = fit_to_bucket_source(
            img, target, buckets[bucket_id], source_buckets[bucket_id]
        )
    else:
        bucket_id = pick_bucket(img.shape[0], img.shape[1], buckets)
        img, target = fit_to_bucket(img, target, buckets[bucket_id])
    return bucket_id, (img, target)


def _pool_load(i: int):
    return _load_fitted(
        _WORKER_DATASET, i, _WORKER_BUCKETS, _WORKER_SOURCE_BUCKETS
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
      num_workers: decode+augment workers (0 = synchronous).
      seed: shuffle seed; advanced every epoch.
      worker_mode: "process" (spawn pool; needs a picklable dataset — real
        parallelism, the augmentation chain is GIL-bound), "thread", or
        "auto" (process on >=4-core hosts).
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
        worker_mode: str = "auto",  # "auto" | "process" | "thread"
        shard: tuple[int, int] = (0, 1),
        image_dtype: str = "float32",  # "uint8" = device-normalize wire format
        wire: str = "target",  # "source" = device-resize wire (uint8 source
        # pixels in a per-bucket canvas; needs emit_source transforms)
        source_buckets: Optional[Sequence[tuple[int, int]]] = None,
    ):
        if worker_mode == "auto":
            # One pool process per core pays IPC for nothing on small hosts
            # (this box's 1-core measurement: 34 img/s sync vs 18 with a
            # 4-process pool); real TPU-VM hosts have 100+ cores.
            worker_mode = "process" if (os.cpu_count() or 1) >= 4 else "thread"
        self.dataset = dataset
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.prefetch = prefetch
        self.worker_mode = worker_mode
        if not (0 <= shard[0] < shard[1]):
            raise ValueError(f"shard index/count {shard} invalid")
        self.shard = shard
        self.image_dtype = image_dtype
        if wire not in ("target", "source"):
            raise ValueError(f"wire must be 'target' or 'source', got {wire!r}")
        self.wire = wire
        if wire == "source":
            self.source_buckets = (
                tuple(source_buckets)
                if source_buckets is not None
                else derive_source_buckets(self.buckets)
            )
            if len(self.source_buckets) != len(self.buckets):
                raise ValueError("source_buckets must pair 1:1 with buckets")
        else:
            self.source_buckets = None
        self.epoch = 0
        self._pool = None
        if self._batch_quota() == 0:
            # quota == 0 would make every epoch a silent no-op (the trainer
            # would "finish" having taken zero optimizer steps).  This is a
            # configuration error: the per-process shard is too small for
            # the guaranteed lower bound floor(n/B) - (k-1) to be positive.
            raise ValueError(
                f"dataset shard of {len(dataset) // shard[1]} items cannot "
                f"guarantee even one full batch per epoch across "
                f"{len(self.buckets)} buckets at batch_size {batch_size} "
                f"(needs >= {len(self.buckets) * batch_size} items/shard); "
                f"use a smaller batch, fewer buckets, or more data"
            )

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _process_stream(self, indices) -> Optional[Iterator]:
        """Ordered item stream from a spawn-based process pool; None when

        the dataset can't be shipped to workers (fall back to threads).

        Submission is windowed (``prefetch * batch_size`` items in flight,
        matching the thread path's out_q bound) instead of one big
        ``Pool.imap``: imap enqueues the whole epoch up front and buffers
        results unboundedly if the consumer stalls (checkpoint/validation
        pauses), which on COCO-scale epochs can grow toward tens of GB of
        augmented images on the host."""
        import multiprocessing as mp
        import pickle

        if self._pool is None:
            try:
                pickle.dumps(self.dataset)
            except Exception:
                return None
            ctx = mp.get_context("spawn")
            counter = ctx.Value("i", 0)
            pool = ctx.Pool(
                self.num_workers,
                initializer=_pool_init,
                initargs=(
                    self.dataset, self.buckets, self.seed, counter,
                    self.source_buckets,
                ),
            )
            # Probe that workers actually bootstrapped: spawn re-imports the
            # parent __main__, which fails for e.g. stdin-driven scripts — a
            # dead pool would otherwise respawn forever and the stream would
            # hang.
            try:
                assert pool.apply_async(_pool_probe).get(timeout=60)
            except Exception:
                pool.terminate()
                pool.join()
                return None
            self._pool = pool

        pool = self._pool
        max_inflight = max(1, self.prefetch) * self.batch_size
        index_iter = iter([int(i) for i in indices])

        def gen():
            from collections import deque

            pending: deque = deque()

            def submit() -> bool:
                try:
                    i = next(index_iter)
                except StopIteration:
                    return False
                pending.append(pool.apply_async(_pool_load, (i,)))
                return True

            for _ in range(max_inflight):
                if not submit():
                    break
            while pending:
                result = pending.popleft().get()
                submit()  # keep the window full; deterministic FIFO order
                yield result

        return gen()

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
        # Multi-process data parallelism: every process shuffles identically
        # (same seed/epoch) and keeps a disjoint strided slice, so the union
        # over processes covers the epoch exactly once (the TPU-native
        # analog of torch DistributedSampler).
        index, count = self.shard
        if count > 1:
            idx = idx[index::count]
        return idx

    def _load_item(self, i: int):
        return _load_fitted(self.dataset, i, self.buckets, self.source_buckets)

    def _item_stream(self, indices) -> Iterator:
        if self.num_workers <= 0:
            for i in indices:
                yield self._load_item(i)
            return

        if self.worker_mode == "process":
            stream = self._process_stream(indices)
            if stream is not None:
                yield from stream
                return
            # dataset not picklable -> thread fallback below

        in_q: queue.Queue = queue.Queue()
        out_q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, 1) * self.batch_size)
        for pos, i in enumerate(indices):
            in_q.put((pos, i))
        stop = object()
        abandoned = threading.Event()
        # The augmentation chain is Python/GIL-bound (the whole reason the
        # process pool exists), so serializing dataset access costs nothing
        # here — and numpy Generators are NOT thread-safe: unlocked threads
        # would race the shared transform RNG's PCG64 state.
        load_lock = threading.Lock()

        def worker():
            while not abandoned.is_set():
                try:
                    pos, i = in_q.get_nowait()
                except queue.Empty:
                    # Same bounded, abandonment-responsive put as below: with
                    # more workers than out_q slots, unconditional puts of
                    # the stop sentinel can block forever after the consumer
                    # walks away, leaking the thread and its queued payloads.
                    while not abandoned.is_set():
                        try:
                            out_q.put(stop, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    return
                try:
                    with load_lock:
                        payload = self._load_item(i)
                except Exception as e:  # surface loader errors, don't hang
                    payload = e
                # Bounded put that stays responsive to abandonment: a
                # consumer that walks away (trainer sample fetch,
                # --limit-*-iters breaks) must not leave threads pinned
                # forever on a full out_q holding decoded images.
                while not abandoned.is_set():
                    try:
                        out_q.put((pos, payload), timeout=0.2)
                        break
                    except queue.Full:
                        continue

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
        try:
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
        finally:
            # Runs on natural exhaustion AND on generator close: release
            # the workers (they re-check `abandoned` on every queue op)
            # and drop any buffered payloads.
            abandoned.set()
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass

    def _batch_quota(self) -> Optional[int]:
        """Exact per-epoch batch count in sharded (multi-process) mode.

        Every process's batches feed a COLLECTIVE train step over the
        global mesh, so all processes must emit the same number of batches
        per epoch or the odd one out hangs at the gradient psum.  Bucket
        composition after random augmentation is data-dependent per shard,
        so the counts can't be equalized by construction; instead every
        process stops at the guaranteed lower bound: a shard of n items
        split across k buckets strands fewer than batch_size items per
        bucket, i.e. emits at least floor(n/B) - (k-1) full batches, and
        the smallest strided shard has floor(N/count) items.
        """
        _, count = self.shard
        if count <= 1 or not self.drop_last:
            return None
        n_min = len(self.dataset) // count
        return max(0, n_min // self.batch_size - (len(self.buckets) - 1))

    def _assemble(self, bucket_id: int, items: list) -> dict[str, np.ndarray]:
        if self.wire == "source":
            return assemble_batch_source(
                items, self.source_buckets[bucket_id], self.max_gt
            )
        return assemble_batch(
            items,
            self.buckets[bucket_id],
            self.max_gt,
            image_dtype=self.image_dtype,
        )

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        indices = self._indices()
        self.epoch += 1
        quota = self._batch_quota()
        emitted = 0
        pools: dict[int, list] = {i: [] for i in range(len(self.buckets))}
        stream = self._item_stream(indices)
        for bucket_id, item in stream:
            if quota is not None and emitted >= quota:
                # Quota reached: drain the worker stream (bounded — at most
                # ~k*batch_size stranded items) so threads/pool tasks finish
                # cleanly, then stop without assembling further batches.
                for _ in stream:
                    pass
                return
            pools[bucket_id].append(item)
            if len(pools[bucket_id]) == self.batch_size:
                batch = self._assemble(bucket_id, pools[bucket_id])
                batch["pad_count"] = np.int32(0)
                batch["image_valid"] = np.ones(self.batch_size, bool)
                pools[bucket_id] = []
                yield batch
                emitted += 1
        if quota is not None:
            # The lower-bound argument guarantees the stream covers the
            # quota; a shortfall means the invariant was violated (e.g. an
            # item routed outside self.buckets) — fail loudly rather than
            # desync the collective.
            if emitted < quota:
                raise RuntimeError(
                    f"sharded loader emitted {emitted} < quota {quota} batches"
                )
            return
        if not self.drop_last:
            for bucket_id, items in pools.items():
                if not items:
                    continue
                pad = self.batch_size - len(items)
                items = items + [items[-1]] * pad
                batch = self._assemble(bucket_id, items)
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
    shard: tuple[int, int] = (0, 1),
    image_dtype: str = "float32",
    wire: str = "target",
    source_buckets=None,
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
        shard=shard,
        image_dtype=image_dtype,
        wire=wire,
        source_buckets=source_buckets,
    )
