"""grain-backed input pipeline — the production-grade alternative to the
threaded BatchLoader (reference DataLoader worker-pool analogue, SURVEY.md
§7(6): "input pipeline at line rate ... grain makes this tractable").

Gives deterministic global shuffling, multi-epoch iteration, worker
processes (decode parallelism beyond the GIL), and checkpointable iterators;
emits the same batch dict the device pipeline consumes. Multi-host DP uses
``process_shard``: every process evaluates the SAME shuffled global order
(seed-pinned) and loads only its contiguous rows of each global batch —
the same within-batch slicing contract as ``BatchLoader(process_shard=)``,
so ``device_prefetch``'s ``make_array_from_process_local_data`` reassembles
a global batch bit-identical to the single-process one
(tests/test_grain_pipeline.py::test_process_shard_reassembles_global_batches).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


class _SampleMap:
    """Picklable callable: index record -> loaded sample dict (callables,
    unlike closures, survive grain's multiprocess workers)."""

    def __init__(self, dataset, cropped: bool = False):
        self.dataset = dataset
        self.cropped = cropped

    def __call__(self, idx: int) -> Dict[str, np.ndarray]:
        if self.cropped:
            return self.dataset.load_sample_cropped(int(idx))
        return self.dataset.load_sample(int(idx))


class _ShardIndex:
    """Picklable callable: LOCAL sample position -> global dataset index.

    The global (shuffled) stream is conceptually chopped into global
    batches of ``global_batch``; process ``pid`` of ``nproc`` owns the
    contiguous rows ``[pid*L, (pid+1)*L)`` of every batch (L = per-process
    batch). Local position j therefore reads global stream position
    ``(j // L) * global_batch + pid * L + (j % L)``. ``base`` is the
    shuffled index MapDataset — random access into it is O(1) index
    arithmetic, so skipped rows are never materialized."""

    def __init__(self, base, global_batch: int, pid: int, nproc: int):
        self.base = base
        self.B = int(global_batch)
        self.L = int(global_batch) // int(nproc)
        self.off = int(pid) * self.L

    def __call__(self, j) -> int:
        j = int(j)
        return int(self.base[(j // self.L) * self.B + self.off
                             + (j % self.L)])


def make_grain_loader(dataset, batch_size: int, *, shuffle: bool = False,
                      seed: int = 0, num_epochs: int | None = 1,
                      worker_count: int = 0, drop_remainder: bool = True,
                      read_buffer: int = 64, cropped: bool = False,
                      process_shard=None) -> Any:
    """An iterable of collated batch dicts over ``dataset`` (TopDownDataset).

    worker_count=0 runs in-process (tests); >0 spawns grain worker processes.

    ``process_shard``: optional (process_id, num_processes) multi-host DP
    slicing — yields LOCAL batches of ``batch_size / num_processes`` rows,
    each the process's contiguous slice of the corresponding global batch
    (the ``BatchLoader`` contract). Requires ``drop_remainder`` (a partial
    global batch has no well-defined local slice) and single-epoch
    iteration (``fit`` re-creates the loader per epoch).
    """
    import grain

    ds = grain.MapDataset.range(len(dataset))
    if shuffle:
        ds = ds.shuffle(seed=seed)
    local_batch = batch_size
    if process_shard is not None:
        pid, nproc = process_shard
        if not 0 <= pid < nproc:
            raise ValueError(f"bad process_shard {process_shard}")
        if batch_size % nproc:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"{nproc} processes")
        if not drop_remainder or num_epochs != 1:
            raise ValueError("process_shard requires drop_remainder=True "
                             "and num_epochs=1")
        local_batch = batch_size // nproc
        n_local = (len(dataset) // batch_size) * local_batch
        ds = grain.MapDataset.range(n_local).map(
            _ShardIndex(ds, batch_size, pid, nproc))
    if num_epochs is None:
        ds = ds.repeat()
    elif num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.map(_SampleMap(dataset, cropped=cropped))
    it = ds.to_iter_dataset(
        grain.ReadOptions(num_threads=max(1, read_buffer // 16),
                          prefetch_buffer_size=read_buffer))
    it = it.batch(local_batch, drop_remainder=drop_remainder)
    if worker_count > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=worker_count))
    return it


class GrainBatchLoader:
    """Drop-in replacement for ``loader.BatchLoader`` in the training loop
    (same ``__len__``/``__iter__``/epoch-reshuffle contract), backed by grain
    worker processes. Selected via ``TRAIN.LOADER: grain`` (SURVEY.md §7(6)).

    Training-only: always drops the last partial batch (the jitted step is
    compiled for one static batch shape).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 0, process_shard=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.process_shard = process_shard
        self.epoch = 0
        self._skip = 0                # one-shot mid-epoch resume offset

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def set_epoch(self, epoch: int):
        """Pin the shuffle order to a global epoch number (see
        ``BatchLoader.set_epoch``) — keeps resumed runs on the same data
        order as uninterrupted ones."""
        self.epoch = int(epoch)

    def set_position(self, epoch: int, start_batch: int = 0):
        """Resume mid-epoch (see ``BatchLoader.set_position``). Unlike the
        threaded loader, grain workers still DECODE the skipped batches (the
        iterator is consumed up to the offset) — a one-time cost of
        ~start_batch/loader-rate seconds at resume."""
        self.set_epoch(epoch)
        self._skip = int(start_batch)

    def __iter__(self):
        loader = make_grain_loader(
            self.dataset, self.batch_size, shuffle=self.shuffle,
            # fresh seed per epoch mirrors BatchLoader's epoch reshuffle
            seed=self.seed + self.epoch, num_epochs=1,
            worker_count=self.num_workers, drop_remainder=True,
            process_shard=self.process_shard)
        self.epoch += 1
        skip, self._skip = self._skip, 0
        local = self.batch_size if self.process_shard is None \
            else self.batch_size // self.process_shard[1]
        for i, batch in enumerate(loader):
            if i < skip:
                continue
            batch = dict(batch)
            batch["num_valid"] = np.int32(local)
            yield batch


class GrainEvalLoader:
    """Sequential grain-backed loader for ``validate()`` (TEST.LOADER=grain,
    VERDICT round-2 item 7): same contract as the eval BatchLoader — in-order
    iteration, last batch PADDED to the static batch size (the jitted eval
    program has one compiled shape) with ``num_valid`` marking the real rows.
    Worker processes parallelize image decode beyond the GIL.
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 0,
                 cropped: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.cropped = cropped

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        loader = make_grain_loader(
            self.dataset, self.batch_size, shuffle=False, num_epochs=1,
            worker_count=self.num_workers, drop_remainder=False,
            cropped=self.cropped)
        for batch in loader:
            batch = dict(batch)
            real = len(next(iter(batch.values())))
            if real < self.batch_size:
                pad = self.batch_size - real
                batch = {k: np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)])
                    for k, v in batch.items()}
            batch["num_valid"] = np.int32(real)
            yield batch
