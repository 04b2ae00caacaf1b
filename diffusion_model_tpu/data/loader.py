"""Batching + background-prefetch data loader.

The reference uses torch DataLoader with ``num_workers=0, pin_memory=False``
(/root/reference/train_latent_cond.py:58,71) — fully synchronous. On TPU the
jitted step runs asynchronously from Python, so a loader only has to stay one
batch ahead of the device; this one decodes/gathers batches in a background
thread pool and (optionally) pre-shards them onto a mesh so the train step
receives device arrays already laid out for DP.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class PrefetchLoader:
    """Iterates epoch batches with background prefetch.

    Args:
      dataset: object with ``__len__`` and ``batch(indices) -> dict``.
      batch_size: global batch size. When ``drop_last`` is False, the final
        short batch is padded by wrapping around (keeps shapes static for jit).
      shuffle: reshuffle each epoch with a NumPy generator.
      prefetch: number of batches to stage ahead.
      device_put_fn: optional callable applied to each batch dict (e.g.
        ``lambda b: jax.device_put(b, sharding)``).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        device_put_fn: Optional[Callable[[dict], dict]] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        """Multi-host: each process loads its 1/process_count slice of every
        batch (host-count-aware sharding, SURVEY.md §7 step 6). Defaults to
        ``jax.process_index()/jax.process_count()``; ``batch_size`` is the
        GLOBAL batch size."""
        self.dataset = dataset
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.prefetch = max(1, int(prefetch))
        self.device_put_fn = device_put_fn or (lambda b: jax.device_put(b))
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by process count "
                f"{self.process_count}"
            )
        self.batch_size = int(batch_size)
        self._local_batch = self.batch_size // self.process_count

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(idx)
        if self.drop_last:
            m = (n // self.batch_size) * self.batch_size
            return idx[:m]
        # pad by wrapping so every batch has the same static shape
        pad = (-n) % self.batch_size
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        return idx

    def __iter__(self) -> Iterator[dict]:
        idx = self._epoch_indices()
        batches = idx.reshape(-1, self.batch_size)
        # every process takes its contiguous slice of each global batch
        lo = self.process_index * self._local_batch
        batches = batches[:, lo:lo + self._local_batch]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for b in batches:
                    q.put(self.device_put_fn(self.dataset.batch(b)))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        th.join()
