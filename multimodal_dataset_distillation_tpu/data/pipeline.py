"""Input pipeline: threaded prefetching loaders yielding numpy batches.

Replaces the reference's ``torch.utils.data.DataLoader`` usage
(``data/__init__.py:236-256``: 4 workers, pin_memory, drop_last on train).
TPU-first: batches are host numpy (NHWC) handed to jit as whole arrays;
a thread pool overlaps PIL decode/augment with device compute, and
batches are sized statically (drop_last train / pad-final eval) so XLA
never recompiles.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from queue import Queue
from typing import Any, Iterator, List, Optional, Sequence, Tuple

import numpy as np


class Loader:
    """Iterable over (stacked_images, list_or_array_extras...) batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 4,
                 seed: Optional[int] = None, prefetch: int = 2,
                 shard: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        # multi-host per-process sharding: (process_index, process_count).
        # All processes draw the SAME epoch permutation (seed+epoch) and
        # each takes its contiguous chunk — process-major, so stacking the
        # per-host batches in jax.devices() order reproduces the global
        # batch (the working replacement for the reference's dead
        # DistributedSampler, data/__init__.py:229-234). batch_size is
        # the PER-PROCESS batch size.
        self.shard = shard
        self._epoch = 0

    def _shard_len(self) -> int:
        n = len(self.dataset)
        if self.shard is None:
            return n
        pid, nproc = self.shard
        return n // nproc  # equal shards (drop remainder for static shapes)

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = (np.random.RandomState(self.seed + self._epoch)
                   if self.seed is not None else np.random)
            rng.shuffle(idx)
        if self.shard is not None:
            pid, nproc = self.shard
            per = len(self.dataset) // nproc
            idx = idx[pid * per:(pid + 1) * per]
        return idx

    def _collate(self, items: List[Tuple]) -> Tuple:
        cols = list(zip(*items))
        out: List[Any] = [np.stack(cols[0])]
        for col in cols[1:]:
            if isinstance(col[0], str):
                out.append(list(col))
            else:
                out.append(np.asarray(col))
        return tuple(out)

    def __iter__(self) -> Iterator[Tuple]:
        self._epoch += 1
        idx = self._indices()
        n_batches = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]

        from multimodal_dataset_distillation_tpu.utils import augrng

        if self.seed is not None:
            # per-item augmentation RNG: a seeded loader's augment draws
            # are a pure function of (seed, epoch, dataset index) —
            # deterministic under any worker-thread schedule AND
            # identical across multi-host processes fetching the same
            # global index.  Without this, transforms drew from the
            # process-global np.random under concurrency (racy mt19937,
            # schedule-ordered draws): two runs with the same --seed
            # produced different expert trajectories.
            epoch, base = self._epoch, self.seed

            def fetch(i):
                augrng.seed_item(base, epoch, i)
                try:
                    return self.dataset[i]
                finally:
                    augrng.clear()
        else:
            fetch = self.dataset.__getitem__

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            # per-item futures, windowed over `prefetch` batches ahead
            pending: List[List[cf.Future]] = []
            next_batch = 0

            def enqueue():
                nonlocal next_batch
                if next_batch < n_batches:
                    pending.append([pool.submit(fetch, i)
                                    for i in batches[next_batch]])
                    next_batch += 1

            for _ in range(self.prefetch + 1):
                enqueue()
            while pending:
                futs = pending.pop(0)
                enqueue()
                yield self._collate([f.result() for f in futs])


class ArrayPairLoader:
    """In-memory (images, text_embeds) loader — the reference's
    ``TensorDataset`` + DataLoader combo for synthetic-set training
    (``utils.py:109-125``, ``epoch_original.py:175-176``)."""

    def __init__(self, images: np.ndarray, texts: np.ndarray,
                 batch_size: int, shuffle: bool = True,
                 seed: Optional[int] = None):
        assert len(images) == len(texts)
        self.images = np.asarray(images)
        self.texts = np.asarray(texts)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return (len(self.images) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        self._epoch += 1
        idx = np.arange(len(self.images))
        if self.shuffle:
            rng = (np.random.RandomState(self.seed + self._epoch)
                   if self.seed is not None else np.random)
            rng.shuffle(idx)
        for i in range(len(self)):
            b = idx[i * self.batch_size:(i + 1) * self.batch_size]
            yield self.images[b], self.texts[b]
