"""Prefetching data loader: sampler × batch-builder with a background
thread pipeline (double-buffered), replacing torch DataLoader workers
(reference ``modules/datamodule.py:370-376``).  Batch assembly is numpy;
device transfer happens in the train loop (optionally sharded over the
mesh's data axis via ``parallel.shard_batch``).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator

import numpy as np


class DataLoader:
    def __init__(
        self,
        sampler,
        batch_builder: Callable,
        prefetch: int = 2,
    ):
        self.sampler = sampler
        self.batch_builder = batch_builder
        self.prefetch = prefetch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def producer():
            try:
                for idxs in self.sampler:
                    batch = self.batch_builder(idxs)
                    if batch is not None:
                        q.put(batch)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
        t.join()
