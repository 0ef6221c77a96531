"""Host->device input pipeline: batching, shuffling, async prefetch.

Replaces the reference's torch DataLoader(num_workers=8-12, pin_memory=True)
(trainer.py:281-303).  Host work is PNG decode + stacking only; batches are
uint8/uint16-heavy and small, so a thread pool + a two-deep device prefetch
queue keeps the TPU fed.  Under a mesh, jax.device_put with a NamedSharding
splits the batch across the data axis while the current step computes
(double buffering).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np
import jax


class BatchIterator:
    """Yields stacked numpy batch dicts from an indexable sample source.

    drop_last=True always (static shapes; reference uses drop_last=True for
    all three loaders, trainer.py:281-303).
    """

    def __init__(self, load_fn: Callable[[int], dict], num_samples: int,
                 batch_size: int, shuffle: bool = False, seed: int = 0,
                 num_workers: int = 8, array_keys: Optional[Sequence[str]] = None):
        self.load_fn = load_fn
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.array_keys = array_keys
        self.epoch = 0

    def __len__(self) -> int:
        return self.num_samples // self.batch_size

    def _stack(self, samples: list[dict]) -> dict:
        keys = self.array_keys or [
            k for k, v in samples[0].items() if isinstance(v, np.ndarray)]
        return {k: np.stack([s[k] for s in samples]) for k in keys}

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(self.num_samples)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        n_batches = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(n_batches):
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                samples = list(pool.map(self.load_fn, idxs))
                yield self._stack(samples)


def device_prefetch(it: Iterator[dict], sharding=None,
                    size: int = 2) -> Iterator[dict]:
    """Move batches to device ahead of consumption (double buffering).

    sharding: optional jax.sharding.Sharding applied to every array (e.g.
    NamedSharding(mesh, P('data')) to split the batch dimension).
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, jax.tree_util.tree_map(
                lambda _: sharding, batch))
        return jax.device_put(batch)

    def producer():
        try:
            for batch in it:
                q.put(put(batch))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
