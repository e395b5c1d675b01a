"""Batch iteration with shuffling, static shapes, and host->device prefetch.

Replaces the reference's torch DataLoader (workers=2, pin_memory,
ref main.py:60-74) with a thread that stages the next batch while the
device computes the current one. Batches always have the full static
batch size (jit compiles once): the tail of an epoch is padded and a
`n_valid` count is carried so eval metrics stay exact.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass

import numpy as np

from seld_tpu.data.corpus import WindowedCorpus


@dataclass
class Batch:
    mel: np.ndarray  # (B, T, C, F) float32
    label_mask: np.ndarray  # (B, T, G) uint16
    n_valid: int  # rows [0, n_valid) are real; the rest are padding
    accdoa: np.ndarray | None = None  # (B, T, M-1, 3) when the corpus has it


class BatchIterator:
    """Epoch iterator over corpus windows.

    shuffle=True reshuffles indices every epoch from a per-epoch seed
    (deterministic, unlike torch DataLoader's global RNG).
    """

    def __init__(
        self,
        corpus: WindowedCorpus,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.corpus = corpus
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        return -(-len(self.corpus) // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.corpus))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        return idx

    def _make_batch(self, idxs: np.ndarray) -> Batch:
        n_valid = len(idxs)
        if n_valid < self.batch_size:  # pad tail batch to static shape
            pad = np.resize(idxs, self.batch_size)
            idxs = pad
        mel, mask = self.corpus.gather(idxs)
        accdoa = (
            self.corpus.gather_accdoa(idxs)
            if self.corpus.accdoa is not None
            else None
        )
        return Batch(mel=mel, label_mask=mask, n_valid=n_valid, accdoa=accdoa)

    def __iter__(self):
        order = self._epoch_indices()
        self.epoch += 1
        n_batches = len(self)

        if self.prefetch <= 0:
            for b in range(n_batches):
                yield self._make_batch(order[b * self.batch_size : (b + 1) * self.batch_size])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for b in range(n_batches):
                    q.put(
                        self._make_batch(
                            order[b * self.batch_size : (b + 1) * self.batch_size]
                        )
                    )
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        thread.join()


def device_prefetch(iterable, place, depth: int = 2):
    """Yield `place(item)` for each item, keeping `depth` items placed
    ahead of consumption.

    `place` enqueues host->device transfers (jnp.asarray / device_put are
    asynchronous), so placing ahead overlaps the NEXT batch's transfer
    with the current step's compute — the device-side half of the
    loader's double buffering (the host-side half is BatchIterator's
    staging thread). Exactly `depth` items are kept placed ahead at
    steady state (depth=1 already overlaps one batch); depth<=0
    degenerates to inline placement. Ordering is preserved exactly, so
    results are unchanged."""
    from collections import deque

    q: deque = deque()
    for item in iterable:
        q.append(place(item))
        if len(q) > max(depth, 0):
            yield q.popleft()
    while q:
        yield q.popleft()
