"""Host input pipeline: threaded map + prefetch, deterministic PRNG.

Replaces torch ``DataLoader(num_workers=N, pin_memory=True)``
(reference: codes/SRN/data/__init__.py:30-45, codes/DSN/train.py:87) with a
thread pool (the work is numpy/cv2 which releases the GIL) and a bounded
prefetch queue. Batches are stacked numpy dicts ready for
``mesh.shard_batch`` / device_put, so the device never waits on IO.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def _stack(items):
    out: Dict[str, np.ndarray] = {}
    for k in items[0]:
        v = items[0][k]
        if isinstance(v, np.ndarray):
            out[k] = np.stack([it[k] for it in items])
        else:
            out[k] = [it[k] for it in items]
    return out


class Loader:
    """Iterable over stacked batches with shuffle/drop_last semantics.

    Each epoch reshuffles with a per-epoch generator seeded from
    (seed, epoch); each item gets its own Generator seeded from
    (seed, epoch, index) so augmentations replay identically on resume.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 6,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 4,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.ds)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        if self.drop_last:
            idx = idx[: (n // self.bs) * self.bs]
        return idx

    def _get(self, i: int):
        rng = np.random.default_rng((self.seed, self.epoch, int(i)))
        try:
            return self.ds.__getitem__(int(i), rng=rng)
        except TypeError:
            return self.ds[int(i)]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        batches = [idx[i : i + self.bs] for i in range(0, len(idx), self.bs)]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self._get, b))
                        q.put(_stack(items))
                q.put(None)
            except BaseException as e:  # propagate instead of hanging the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
