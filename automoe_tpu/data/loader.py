"""Host-side data loader: sharded sampling + threaded decode + device
prefetch.

Replaces torch's worker-process DataLoader + DistributedSampler
(reference dataloaders/*, training/train_bdd100k_ddp.py:501-523):
  * ShardedSampler — deterministic per-epoch shuffle, sliced per host
    process (`set_epoch` parity included);
  * DataLoader — a thread pool decodes samples ahead of consumption and a
    background thread keeps `prefetch` collated batches ready, so the TPU
    never waits on host decode;
  * optional `device_put_fn` moves batches onto the mesh asynchronously
    (double buffering over the PCIe/tunnel link).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from automoe_tpu.data.collate import stack_batch


class ShardedSampler:
    """Deterministic shuffled index stream, sharded across hosts."""

    def __init__(
        self,
        num_samples: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        drop_last: bool = True,
        batch_size: int = 1,
    ):
        self.num_samples = num_samples
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.batch_size = batch_size
        self.epoch = 0
        self.skip_batches = 0

    def set_epoch(self, epoch: int, skip_batches: int = 0) -> None:
        """skip_batches: start the epoch's (deterministic) batch stream
        that many batches in — mid-epoch resume skips at the INDEX level,
        never loading the already-consumed samples."""
        self.epoch = epoch
        self.skip_batches = skip_batches

    def _per_shard(self) -> int:
        if self.drop_last:
            return self.num_samples // self.num_shards
        return -(-self.num_samples // self.num_shards)

    def __iter__(self) -> Iterator[List[int]]:
        idx = np.arange(self.num_samples)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # Equalize shards FIRST (torch DistributedSampler semantics):
        # truncate (drop_last) or wrap-pad so every shard sees exactly the
        # same count — SPMD trainers need every process to execute the same
        # number of jitted collective steps per epoch.
        per_shard = self._per_shard()
        total = per_shard * self.num_shards
        if total <= len(idx):
            idx = idx[:total]
        else:
            # cyclic repeat (padding may exceed the dataset size when
            # num_shards ≫ num_samples — torch DistributedSampler semantics)
            idx = np.resize(idx, total)
        idx = idx[self.shard_index :: self.num_shards]
        n_full = len(idx) // self.batch_size
        for b in range(min(self.skip_batches, n_full), n_full):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size].tolist(), self.batch_size
        rem = idx[n_full * self.batch_size :]
        if len(rem) and not self.drop_last and self.skip_batches <= n_full:
            # repeat-pad the final batch to keep shapes static; the second
            # element carries the REAL count so consumers can weight the
            # padded tail correctly (Trainer.validate does)
            pad = np.resize(rem, self.batch_size)
            yield pad.tolist(), len(rem)

    def __len__(self) -> int:
        n = self._per_shard()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)


class DataLoader:
    """Iterable over collated numpy (or device) batches."""

    def __init__(
        self,
        dataset,
        *,
        batch_size: int = 32,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 2,
        collate_fn: Optional[Callable] = None,
        num_shards: int = 1,
        shard_index: int = 0,
        device_put_fn: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn or stack_batch
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.device_put_fn = device_put_fn
        self.sampler = ShardedSampler(
            len(dataset),
            shuffle=shuffle,
            seed=seed,
            num_shards=num_shards,
            shard_index=shard_index,
            drop_last=drop_last,
            batch_size=batch_size,
        )

    def set_epoch(self, epoch: int, skip_batches: int = 0) -> None:
        self.sampler.set_epoch(epoch, skip_batches)

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self):
        batches = iter(self.sampler)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        SENTINEL = object()

        # Datasets exposing read_batch (native packed caches) gather a whole
        # batch in one call — skip per-sample map + collate. Only valid with
        # the default stacking collate: read_batch already returns [B, ...].
        read_batch = (
            getattr(self.dataset, "read_batch", None)
            if self.collate_fn is stack_batch
            else None
        )

        def put(item) -> bool:
            # bounded put that notices consumer abandonment (early break):
            # without the stop check a full queue blocks this thread forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx, real in batches:
                        if stop.is_set():
                            return
                        if read_batch is not None:
                            batch = read_batch(batch_idx)
                        else:
                            samples = list(
                                pool.map(self.dataset.__getitem__, batch_idx)
                            )
                            batch = self.collate_fn(samples)
                        if self.device_put_fn is not None:
                            batch = self.device_put_fn(batch)
                        if real != len(batch_idx):
                            batch = dict(batch)
                            batch["_real_count"] = real
                        if not put(batch):
                            return
            except BaseException as e:  # surface in the consumer, not stderr
                put(e)
            finally:
                put(SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise RuntimeError(
                        "DataLoader worker failed (epoch would otherwise be "
                        "silently truncated)"
                    ) from item
                yield item
        finally:
            stop.set()
            try:
                while True:  # unblock a producer stuck on a full queue
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)
