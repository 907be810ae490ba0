"""Host input pipeline: threaded decode/collate + device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` worker pool
(SURVEY.md §3.1) with a thread-pool loader (image decode releases the GIL in
cv2/PIL) and an explicit **double-buffered device prefetch**: the next batch
is transferred to HBM while the current one computes, so the H2D copy rides
under the step (BASELINE.json:5 "double-buffers HBM-resident batches").
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import numpy as np


class BatchLoader:
    """Yields collated host batches from a TopDownDataset."""

    def __init__(self, dataset, batch_size: int, shuffle=False,
                 drop_last=False, num_workers: int = 8, seed: int = 0,
                 lookahead: int = 4, pad_last: bool = True,
                 cropped: bool = False, process_shard=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.lookahead = lookahead
        self.pad_last = pad_last
        self.cropped = cropped        # host-side crop pipeline (eval)
        # (process_id, num_processes): multi-host DP — every process computes
        # the SAME global batch order (seed+epoch pinned) and collates only
        # its contiguous slice of each batch; ``device_prefetch`` assembles
        # the global array via make_array_from_process_local_data. The torch
        # DistributedSampler analogue, but sliced within-batch so the global
        # batch is bit-identical to the single-process one.
        if process_shard is not None:
            pid, nproc = process_shard
            assert 0 <= pid < nproc, process_shard
            assert drop_last, "process_shard requires drop_last " \
                "(partial global batches have no well-defined local slice)"
            assert batch_size % nproc == 0, (batch_size, nproc)
        self.process_shard = process_shard
        self.epoch = 0
        self._skip = 0                # one-shot mid-epoch resume offset

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Pin the shuffle order to a global epoch number (torch
        ``DistributedSampler.set_epoch`` analogue).  ``fit()`` calls this
        every epoch so a resumed run sees the SAME data order the
        uninterrupted run would have — without it the order depends on how
        many times this loader object happened to be iterated."""
        self.epoch = int(epoch)

    def set_position(self, epoch: int, start_batch: int = 0):
        """Resume mid-epoch: pin the epoch AND skip the first
        ``start_batch`` batches of it (one-shot — the next ``__iter__``
        consumes the skip). The skipped batches are never decoded: the
        shuffle permutation is a pure function of the epoch, so skipping is
        index arithmetic (preemption resume, ``fit``/``PreemptionGuard``)."""
        self.set_epoch(epoch)
        self._skip = int(start_batch)

    def _index_batches(self):
        """List of (indices, num_real) — indices padded to batch_size by
        repeating the last real index."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        batches = []
        for i in range(0, len(idx), self.batch_size):
            b = idx[i:i + self.batch_size]
            real = len(b)
            if real < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_last:
                    b = np.concatenate(
                        [b, np.full(self.batch_size - real, b[-1])])
            batches.append((b, real))
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        if self.process_shard is not None:
            from rsgnet_tpu.parallel.distributed import shard_bounds
            pid, nproc = self.process_shard
            batches = [(b[slice(*shard_bounds(len(b), pid, nproc))], real)
                       for b, real in batches]
        if self._skip:
            batches = batches[self._skip:]
            self._skip = 0
        self.epoch += 1
        window = self.lookahead + self.num_workers   # bounded decode-ahead
        collate = (lambda b: self.dataset.collate(b, cropped=True)) \
            if self.cropped else self.dataset.collate
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            for b, _ in batches[:window]:
                pending.append(pool.submit(collate, b))
            for i, (b, real) in enumerate(batches):
                batch = pending[i].result()
                nxt = i + window
                if nxt < len(batches):
                    pending.append(pool.submit(collate, batches[nxt][0]))
                batch["num_valid"] = np.int32(real)
                pending[i] = None            # release decoded batch memory
                yield batch


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Move batches to device ``size`` steps ahead of consumption.

    When ``sharding`` spans devices of OTHER processes (multi-host DP), each
    process's batches are its local shard and the global array is assembled
    with ``jax.make_array_from_process_local_data`` — the H2D overlap works
    identically; only the addressable slice moves over this host's PCIe.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    if sharding is not None and not sharding.is_fully_addressable:
        def put(v):
            return jax.make_array_from_process_local_data(sharding, v)
    elif sharding is not None:
        def put(v):
            return jax.device_put(v, sharding)
    else:
        put = jax.device_put

    stop = threading.Event()

    def guarded_put(item) -> bool:
        """Blocking put that gives up once the consumer is gone (early
        break, e.g. a preemption stop) so the thread never leaks."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # a decode/device_put failure must surface in the consumer, not
        # silently truncate the epoch
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                batch = {k: (put(v) if isinstance(v, np.ndarray) else v)
                         for k, v in batch.items()}
                if not guarded_put(batch):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            guarded_put(e)
        else:
            guarded_put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer exited (normally, by break, or by GC of the generator):
        # release the producer and drop any buffered batches
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
