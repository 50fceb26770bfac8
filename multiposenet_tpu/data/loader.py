"""Threaded prefetching batch loader — the host IO layer.

Replaces the reference's torch DataLoader + custom streaming subclass
(datasets/dataloader.py:6-38).  Workers decode/augment with cv2 (which
releases the GIL), batches are stacked into pinned numpy arrays and
prefetched a few steps ahead so the TPU never waits on host IO.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4, shard_id: int = 0, num_shards: int = 1):
        """`batch_size` is the PER-HOST batch.  For multi-host training pass
        shard_id=process_index, num_shards=process_count: every host shuffles
        with the same seed and takes a disjoint stride of the global order, so
        the union of shards covers the dataset exactly once per epoch."""
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0

    def _shard_size(self):
        # floor-div: every shard gets the SAME length, dropping up to
        # num_shards-1 trailing samples (hosts must run the same number of
        # steps or collectives deadlock)
        return len(self.dataset) // self.num_shards

    def __len__(self):
        n = self._shard_size()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        order = order[self.shard_id::self.num_shards][: self._shard_size()]
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield order[i: i + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self.epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        idx_q: "queue.Queue" = queue.Queue()
        batches = list(self._index_batches())
        for bi, b in enumerate(batches):
            idx_q.put((bi, b))

        results: Dict[int, Dict] = {}
        results_lock = threading.Lock()
        next_emit = [0]
        done = threading.Event()

        def worker(wid: int):
            rng = np.random.default_rng((self.seed + self.epoch) * 10007 + wid)
            while not done.is_set():
                try:
                    bi, idxs = idx_q.get_nowait()
                except queue.Empty:
                    return
                samples = [self.dataset.__getitem__(int(i), rng=rng)
                           for i in idxs]
                batch = {k: np.stack([s[k] for s in samples])
                         for k in samples[0]}
                with results_lock:
                    results[bi] = batch
                # emit in order
                while True:
                    with results_lock:
                        if next_emit[0] in results:
                            item = results.pop(next_emit[0])
                            next_emit[0] += 1
                        else:
                            break
                    out_q.put(item)

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for _ in range(len(batches)):
                yield out_q.get()
        finally:
            done.set()


    def stream(self) -> Iterator[Dict[str, np.ndarray]]:
        """Endless batch generator (reference datasets/dataloader.py:6-38
        sDataLoader.get_stream)."""
        while True:
            yield from iter(self)

    def copy(self) -> "Loader":
        """Independent loader over the same dataset and settings (reference
        datasets/dataloader.py:31-38 sDataLoader.copy), with its own epoch
        counter so iteration order restarts from the base seed."""
        return Loader(self.dataset, self.batch_size, shuffle=self.shuffle,
                      num_workers=self.num_workers, seed=self.seed,
                      drop_last=self.drop_last, prefetch=self.prefetch,
                      shard_id=self.shard_id, num_shards=self.num_shards)


def device_prefetch(iterator, put_fn: Callable, depth: int = 2):
    """Overlap H2D transfer with compute: a background thread runs
    `put_fn` (device placement) up to `depth` batches ahead.

    The put happens OFF the consumer thread — `jax.device_put` releases
    the GIL during the transfer, so H2D genuinely overlaps the main
    thread's dispatch work.  (A same-thread lookahead buffer would still
    serialize when the put itself blocks, e.g. over a remote runtime
    where an 11 MB batch costs ~250 ms to ship.)
    """
    out_q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        """Stop-aware put: never blocks past consumer abandonment."""
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def pump():
        try:
            for batch in iterator:
                if not _put((None, put_fn(batch))):
                    return
        except BaseException as e:  # propagate into the consumer
            _put((e, None))
            return
        _put((None, _END))

    th = threading.Thread(target=pump, daemon=True, name="device_prefetch")
    th.start()
    try:
        while True:
            exc, item = out_q.get()
            if exc is not None:
                raise exc
            if item is _END:
                return
            yield item
    finally:
        stop.set()
