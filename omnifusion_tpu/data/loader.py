"""Multi-worker batching data loader (host-side).

Replaces torch DataLoader (train_erp_depth.py:114-132, workers=8): a
thread pool decodes/augments samples while the TPU computes, batches are
NHWC numpy dicts ready for device_put.  Threads (not processes) suffice —
cv2 releases the GIL during decode/resize.
"""

from __future__ import annotations

import concurrent.futures
import threading
from typing import Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        end = (len(idx) // self.batch_size) * self.batch_size if self.drop_last else len(idx)
        for s in range(0, end, self.batch_size):
            yield idx[s : s + self.batch_size]

    def _load_batch(self, indices) -> dict[str, np.ndarray]:
        samples = [self.dataset[int(i)] for i in indices]
        cols = [np.stack(x) for x in zip(*samples)]
        if len(cols) == 3:  # depth datasets: (rgb, depth, mask)
            return {"rgb": cols[0], "depth": cols[1], "mask": cols[2]}
        if len(cols) == 2:  # segmentation datasets: (rgb, labels)
            return {"rgb": cols[0], "labels": cols[1]}
        raise ValueError(f"unexpected sample arity {len(cols)}")

    def prefetch_to_device(self, size: int = 2, sharding=None) -> Iterator[dict]:
        """Iterate device-resident batches, overlapping H2D copies with
        compute (the torch loader's pin_memory+workers role on TPU).

        sharding: optional jax.sharding.Sharding for the batch (e.g.
        ``batch_sharding(mesh)`` to split the leading dim over the mesh's
        data axis — the reference DataParallel's scatter, done at H2D time)."""
        import collections

        import jax

        def put(b):
            if sharding is not None:
                lead = next(iter(b.values())).shape[0]
                n_data = dict(getattr(sharding, "mesh", None).shape).get("data", 1) if getattr(sharding, "mesh", None) is not None else 1
                if lead % n_data == 0:
                    return jax.device_put(b, sharding)
            # ragged tail batch (drop_last=False): replicate instead of shard
            return jax.device_put(b)
        queue: collections.deque = collections.deque()
        it = iter(self)
        try:
            while True:
                while len(queue) < size:
                    queue.append(put(next(it)))
                yield queue.popleft()
        except StopIteration:
            while queue:
                yield queue.popleft()

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        self._epoch += 1
        batches = list(self._batch_indices())
        if self.num_workers <= 1:
            for b in batches:
                yield self._load_batch(b)
            return
        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            window = self.num_workers * max(self.prefetch, 1)
            futures = [pool.submit(self._load_batch, b) for b in batches[:window]]
            next_submit = window
            for i in range(len(batches)):
                yield futures[i].result()
                futures[i] = None
                if next_submit < len(batches):
                    futures.append(pool.submit(self._load_batch, batches[next_submit]))
                    next_submit += 1
