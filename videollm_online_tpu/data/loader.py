"""Minimal torch-free data loader: shuffling, batching, collation, and an
optional prefetch thread pool (the reference uses torch DataLoader with 16
workers, scripts/*: --dataloader_num_workers 16; dataset __getitem__ here is
numpy slicing + string rendering, so threads suffice)."""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterator


class DataLoader:
    def __init__(self, dataset, *, batch_size: int, collate_fn: Callable,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 num_workers: int = 0, prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        idxs = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idxs)
        if self.process_count > 1:
            # multi-host: same seed everywhere, disjoint stripes per process
            # (the torchrun DistributedSampler contract)
            idxs = idxs[self.process_index::self.process_count]
        for i in range(0, len(idxs), self.batch_size):
            chunk = idxs[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield chunk

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            for chunk in self._index_batches():
                yield self.collate_fn([self.dataset[j] for j in chunk])
            self.epoch += 1
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def producer():
            try:
                for chunk in self._index_batches():
                    q.put(self.collate_fn([self.dataset[j] for j in chunk]))
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
        self.epoch += 1
