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

    def __next__(self) -> dict:
        if self._pos + self.batch_size > len(self._order):
            if self._pos > 0 or len(self._order) == 0:
                self.epochs_completed += int(len(self._order) > 0)
                self._reshuffle()
        idx = self._order[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        if self._pool is not None:
            samples = list(self._pool.map(self.dataset.__getitem__, idx))
        else:
            samples = [self.dataset[i] for i in idx]
        return collate(samples)


class DevicePrefetcher:
    """Background thread that keeps device-resident batches ahead of compute.

    Wraps any batch iterator; each batch is ``jax.device_put`` (optionally
    with a ``sharding`` for multi-device data parallelism) from the producer
    thread, so the host→HBM DMA of batch i+1 overlaps the train step on
    batch i.
    """

    def __init__(self, it, *, buffer_size: int = 2, sharding=None,
                 transform=None):
        self._it = it
        self._sharding = sharding
        self._transform = transform
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._error = None
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                if self._stop.is_set():
                    return
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
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def sample_stream(dataset, batch_size: int, *, seed: int = 0,
                  shuffle: bool = True, prefetch: bool = True,
                  sharding=None, num_threads: int = 8):
    """The framework's ``load_sample`` equivalent: an infinite device stream."""
    stream = BatchStream(dataset, batch_size, shuffle=shuffle, seed=seed,
                         num_threads=num_threads)
    if not prefetch:
        return stream
    return DevicePrefetcher(stream, sharding=sharding)
