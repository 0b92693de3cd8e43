"""Host-side batching and device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` + ``load_sample``
iterator-reset idiom (src_deformable/main.py:24-42, 50-60; built with default
``num_workers=0`` — single-threaded, synchronous). Here:

- ``BatchStream`` is an infinite shuffled batch iterator with deterministic
  per-epoch reshuffling (the reference reshuffles on iterator reset; we keep
  that semantic but seeded).
- Samples are assembled by a thread pool (the per-sample work — JPEG decode +
  least-squares fits — is numpy, which releases the GIL in the hot parts).
- ``DevicePrefetcher`` keeps ``buffer_size`` batches in flight on device via
  ``jax.device_put``, double-buffering host→HBM copies behind the train step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from .dataset import collate


class BatchStream:
    """Infinite shuffled batch iterator over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, num_threads: int = 8):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._idx_lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=num_threads) \
            if num_threads > 1 else None
        self._order: np.ndarray = np.array([], dtype=np.int64)
        self._pos = 0
        self.epochs_completed = 0

    def _reshuffle(self):
        n = len(self.dataset)
        self._order = self._rng.permutation(n) if self.shuffle \
            else np.arange(n)
        self._pos = 0

    def __iter__(self):
        return self

    def next_indices(self) -> np.ndarray:
        """Thread-safe draw of the next batch's sample indices."""
        with self._idx_lock:
            if self._pos + self.batch_size > len(self._order):
                if self._pos > 0 or len(self._order) == 0:
                    self.epochs_completed += int(len(self._order) > 0)
                    self._reshuffle()
            idx = self._order[self._pos:self._pos + self.batch_size]
            self._pos += self.batch_size
            return idx

    def seek_batches(self, k: int) -> None:
        """Advance the shuffle state by ``k`` batch draws without
        assembling anything — index math only (an occasional O(n)
        permutation per dataset pass). Deterministic resume: a stream
        created with the same seed and seeked by the number of batches a
        crashed run had drawn continues EXACTLY where a continuous run
        would be (SURVEY §5: 'deterministic restart of the data stream';
        the reference reshuffles arbitrarily on every iterator reset)."""
        for _ in range(k):
            self.next_indices()

    def assemble(self, idx: np.ndarray) -> dict:
        """Build one batch; safe to call from several threads at once."""
        if self._pool is not None:
            samples = list(self._pool.map(self.dataset.__getitem__, idx))
        else:
            samples = [self.dataset[i] for i in idx]
        return collate(samples)

    def __next__(self) -> dict:
        return self.assemble(self.next_indices())


class DevicePrefetcher:
    """Background threads keeping device-resident batches ahead of compute.

    Wraps any batch iterator; each batch is ``jax.device_put`` (optionally
    with a ``sharding`` for multi-device data parallelism) from a producer
    thread, so the host→HBM DMA of batch i+1 overlaps the train step on
    batch i. With ``num_workers > 1``, several threads assemble batches
    concurrently (the source iterator is locked per draw; batch order is
    then nondeterministic across workers — fine for shuffled training).
    """

    def __init__(self, it, *, buffer_size: int = 4, sharding=None,
                 transform=None, num_workers: int = 1):
        self._it = it
        self._sharding = sharding
        self._transform = transform
        self._q: queue.Queue = queue.Queue(maxsize=max(buffer_size,
                                                       num_workers + 1))
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._error = None
        self._live = num_workers
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(num_workers)]
        for t in self._threads:
            t.start()

    def _worker(self):
        splittable = hasattr(self._it, "next_indices")
        try:
            while not self._stop.is_set():
                if splittable:
                    # cheap index draw under the iterator's own lock;
                    # expensive assembly runs in parallel across workers
                    batch = self._it.assemble(self._it.next_indices())
                else:
                    with self._lock:
                        try:
                            batch = next(self._it)
                        except StopIteration:
                            break
                if self._transform is not None:
                    batch = self._transform(batch)
                batch = jax.device_put(batch, self._sharding)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.25)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surfaced on next __next__
            self._error = e
        finally:
            with self._lock:
                self._live -= 1
                if self._live == 0:
                    self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so workers blocked on a full queue can observe the stop flag
        for _ in range(3):
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            for t in self._threads:
                t.join(timeout=1.0)
            if not any(t.is_alive() for t in self._threads):
                break


def sample_stream(dataset, batch_size: int, *, seed: int = 0,
                  shuffle: bool = True, prefetch: bool = True,
                  sharding=None, num_threads: int = 8,
                  num_workers: int = 3, skip_batches: int = 0):
    """The framework's ``load_sample`` equivalent: an infinite device stream.

    ``skip_batches`` seeks the shuffle state BEFORE the prefetcher's
    workers start pulling (deterministic resume — see
    ``BatchStream.seek_batches``)."""
    stream = BatchStream(dataset, batch_size, shuffle=shuffle, seed=seed,
                         num_threads=num_threads)
    if skip_batches:
        stream.seek_batches(skip_batches)
    if not prefetch:
        return stream
    return DevicePrefetcher(stream, sharding=sharding,
                            num_workers=num_workers)
