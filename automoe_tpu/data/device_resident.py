"""Device-resident epoch loader: train at the device-step bound on
tunneled/thin-host runtimes.

The r3 loop benchmarks showed the integrated Trainer at B=32/256² is
HOST-TRANSFER-bound on this environment (613 ms/step H2D over the ~50 MB/s
tunnel vs a 16 ms device step — benchmarks/BENCHMARKS.md "Trainer-loop
pipelining"), so sustained-epoch throughput could only be *extrapolated*
from device-step microbenches. This module closes that gap: it stages an
epoch's working set in HBM **once**, reshuffles it sample-level **on
device** each epoch, and yields batches (or pre-stacked [K,B,...] scan
groups) that are already mesh-sharded `jax.Array`s — the Trainer's hot
loop then does zero per-step H2D and one metrics RPC per K steps
(`steps_per_call`), holding the device-step bound for entire epochs.

Where the reference streams every batch from host disk through
DataLoader workers each step (training/train_bdd100k_ddp.py:150-194 —
the right design for a PCIe-attached GPU box), a TPU host feeding chips
over a slow link wants the dataset resident device-side. Real uses:
 - cached-gating training (`--cache-expert-features`): pooled features
   + waypoint targets + frames (r5: frames ARE staged — the policy
   backbone trains through them, models/automoe.py:214-224 — at
   S*S*3*4 B each, so epoch size is frame-bound: ~786 KB/sample at
   256²; a few thousand samples fit comfortably);
 - any synthetic/augmentation-generated workload;
 - datasets whose packed shards fit HBM (see data/packed.py sizes).

Protocol: drop-in for the Trainer — `__len__` (BATCHES per epoch),
`set_epoch(epoch, skip_batches=0)`, iteration. With `group_size == K ==
TrainConfig.steps_per_call`, the Trainer's grouped path detects the
loader (attribute `group_size`) and dispatches each yielded [K,B,...]
group straight into the scan step — no host stacking, no transfer.

`shared` entries are per-batch constants staged once and re-yielded
with every group (for inputs that genuinely don't vary per sample —
NOT for frames; see `from_dataset` on why dropping consumed fields is
a correctness bug).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from automoe_tpu.parallel.mesh import (
    batch_sharding,
    stacked_batch_sharding,
)


class DeviceEpochLoader:
    """One epoch of per-sample arrays, HBM-resident, device-reshuffled.

    arrays: dict name -> np.ndarray [N, ...] (the per-sample data).
    batch_size: per-step batch B. group_size: K batches per yielded
    group (match TrainConfig.steps_per_call; 1 = plain [B,...] batches,
    e.g. for validation). steps_per_epoch: batches per epoch — defaults
    to N // B; larger values cycle the resident pool with fresh group
    permutations (ledger: repeated data — for perf runs / small pools).
    shared: dict name -> np.ndarray [B, ...] per-batch constants, tiled
    to [K,B,...] once when group_size > 1.
    """

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        *,
        batch_size: int,
        group_size: int = 1,
        mesh=None,
        shared: Optional[Dict[str, np.ndarray]] = None,
        seed: int = 0,
        steps_per_epoch: Optional[int] = None,
        shuffle: bool = True,
        index_mode: bool = False,
    ):
        if not arrays:
            raise ValueError("arrays must be non-empty")
        if index_mode and shared:
            raise ValueError(
                "index_mode yields base indices into the flat epoch — "
                "per-batch `shared` constants can't ride along; merge "
                "them into `arrays` or disable index_mode"
            )
        self.index_mode = bool(index_mode)
        n_local = len(next(iter(arrays.values())))
        for k, v in arrays.items():
            if len(v) != n_local:
                raise ValueError(
                    f"array '{k}' has {len(v)} samples, expected {n_local}"
                )
        # Multi-host: each process passes its LOCAL dataset shard and
        # LOCAL batch size (the same convention as the host DataLoader's
        # ShardedSampler slice + shard_batch assembly). The global flat
        # epoch is assembled from the per-process shards; every count
        # below (N, B, groups) is then GLOBAL, and the per-epoch
        # permutation — identical on every process, deterministic in
        # (seed, epoch) — reshuffles sample-level across the whole
        # cluster inside the jitted gather.
        n_proc = jax.process_count() if mesh is not None else 1
        self._multihost = n_proc > 1
        if self._multihost and mesh is not None:
            data_ax = dict(mesh.shape).get("data", 1)
            if data_ax % n_proc:
                raise ValueError(
                    f"mesh data axis ({data_ax}) must divide by the "
                    f"process count ({n_proc}) for multi-host residency"
                )
        B_local, K = batch_size, max(1, group_size)
        n = n_local * n_proc
        B = B_local * n_proc
        if n % (B * K):
            raise ValueError(
                f"N={n} must divide by batch_size*group_size={B * K} "
                "(trim the arrays — static shapes, no tail)"
            )
        if mesh is not None:
            data = dict(mesh.shape).get("data", 1)
            if B % data:
                raise ValueError(
                    f"batch_size={B} must divide by the mesh data axis "
                    f"({data})"
                )
        self.batch_size = B_local  # per-process view (Trainer contract)
        self.group_size = K
        self.mesh = mesh
        self.seed = seed
        self.shuffle = shuffle
        self._n = n
        self._groups_nat = n // (B * K)
        spe = steps_per_epoch if steps_per_epoch is not None else n // B
        if spe % K:
            raise ValueError(
                f"steps_per_epoch={spe} must divide by group_size={K}"
            )
        self._steps_per_epoch = spe
        self._groups = spe // K

        dsh = batch_sharding(mesh) if mesh is not None else None

        def _stage(v, sh):
            v = np.asarray(v)
            if self._multihost:
                return jax.make_array_from_process_local_data(sh, v)
            if sh is not None:
                return jax.device_put(v, sh)
            return jax.device_put(v)

        # flat epoch staged ONCE (the only bulk H2D of the run)
        self._flat = {k: _stage(v, dsh) for k, v in arrays.items()}
        self._shared = {}
        if shared:
            gsh = (
                (stacked_batch_sharding(mesh) if K > 1 else dsh)
                if mesh is not None else None
            )
            for k, v in shared.items():
                v = np.asarray(v)
                if len(v) != B_local:
                    raise ValueError(
                        f"shared '{k}' must be a [B={B_local}, ...] "
                        f"batch, got {v.shape}"
                    )
                if K > 1:
                    v = np.broadcast_to(v[None], (K,) + v.shape)
                if self._multihost:
                    # per-batch constants: every process contributes its
                    # B_local rows of the global [.., B, ...] batch axis
                    self._shared[k] = jax.make_array_from_process_local_data(
                        gsh, v
                    )
                else:
                    self._shared[k] = (
                        jax.device_put(v, gsh) if gsh is not None
                        else jax.device_put(v)
                    )

        grouped_layout = K > 1 and not self.index_mode
        out_spec = (
            jax.sharding.NamedSharding(
                mesh,
                jax.sharding.PartitionSpec(
                    None, *((None,) if grouped_layout else ()), "data"
                ),
            )
            if mesh is not None else None
        )

        @functools.partial(
            jax.jit,
            **({"out_shardings": out_spec} if out_spec is not None else {}),
        )
        def _reshuffle(flat_tree, perm):
            def one(x):
                y = jnp.take(x, perm, axis=0)
                # index_mode keeps the FLAT [S, B, ...] batch layout —
                # the indexed scan step slices its own batches, so no
                # [G, K, B, ...] grouping (and no per-group gather copy)
                lead = (
                    (self._groups_nat, K, B) if grouped_layout
                    else (n // B, B)
                )
                return y.reshape(lead + x.shape[1:])

            return jax.tree.map(one, flat_tree)

        self._reshuffle = _reshuffle

        take_out_spec = (
            jax.sharding.NamedSharding(
                mesh,
                jax.sharding.PartitionSpec(
                    *(() if K == 1 else (None,)), "data"
                ),
            )
            if mesh is not None else None
        )

        # ONE dispatch per yielded group: slicing each field separately
        # cost ~10 host RPC dispatches per group on tunneled runtimes —
        # measured ~37 ms/group of host overhead that held sustained
        # epochs to 0.63x the device-step bound (BENCHMARKS.md r5
        # interleaved run #2). g is passed as an np.int32 so it traces
        # as an argument (one compile serves every group index).
        @functools.partial(
            jax.jit,
            **({"out_shardings": take_out_spec}
               if take_out_spec is not None else {}),
        )
        def _take_group(groups, g):
            return jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, g, axis=0, keepdims=False
                ),
                groups,
            )

        self._take_group = _take_group
        self._epoch_groups = None  # dict name -> [G_nat,(K,)B,...]
        self._order: np.ndarray = np.arange(self._groups)
        self._skip_groups = 0
        self.set_epoch(0)

    @classmethod
    def from_dataset(
        cls,
        dataset,
        *,
        batch_size: int,
        group_size: int = 1,
        mesh=None,
        drop=(),
        shared: Optional[Dict[str, np.ndarray]] = None,
        seed: int = 0,
        shuffle: bool = True,
        read_chunk: int = 256,
        verbose: bool = True,
        indices: Optional[Sequence[int]] = None,
        index_mode: bool = False,
    ) -> "DeviceEpochLoader":
        """Materialize a map-style dataset into an HBM-resident loader.

        Reads every sample once on the host (the dataset's `read_batch`
        fast path when it has one), drops `drop` keys, skips non-array
        fields, and trims N down to a multiple of batch_size*group_size
        (static shapes — the same drop-last rule as the host DataLoader,
        extended to the scan group).

        `drop` defaults to EMPTY: every model input the dataset yields
        is staged. Dropping a consumed field silently changes the
        trained model — the r4 default dropped `image` on the false
        claim that the cached-gating step DCEs it, but the trajectory
        policy head consumes the image through its own TRAINABLE
        backbone (models/automoe.py:214-224, mirroring reference
        automoe.py's second image consumption), so r4 device-resident
        gating runs trained that backbone on a dummy. Measured on the
        v5e (r5 probe): the cached step is 4.5 ms with real 256-sq
        frames vs ~0.1 ms with a 4x4 dummy — the image path IS the
        step. Only pass `drop` for fields verified unused by the loss;
        tests/test_device_resident.py pins that the cached-gating loss
        depends on image pixels.

        `indices` restricts the read to a subset of the dataset — the
        multi-host path passes this process's static shard
        (range(process_index, N, process_count), the ShardedSampler
        slice rule) so each host stages only its share of the epoch."""
        idx_all = (list(indices) if indices is not None
                   else list(range(len(dataset))))
        n_total = len(idx_all)
        B, K = batch_size, max(1, group_size)
        if mesh is not None and jax.process_count() > 1:
            # per-process dataset shards can differ by one sample; the
            # resident global assembly needs every process to stage the
            # SAME local count — sync to the cluster-wide minimum
            from jax.experimental import multihost_utils

            n_total = int(
                multihost_utils.process_allgather(
                    np.asarray(n_total)
                ).min()
            )
        n = (n_total // (B * K)) * (B * K)
        if n == 0:
            raise ValueError(
                f"dataset has {n_total} samples < one "
                f"batch_size*group_size={B * K} group"
            )
        reader = getattr(dataset, "read_batch", None)
        dropped = set(drop) | {"_real_count"}
        chunks: list = []
        for lo in range(0, n, read_chunk):
            idxs = idx_all[lo:min(lo + read_chunk, n)]
            if reader is not None:
                c = dict(reader(idxs))
                # free dropped fields (e.g. frames) per chunk, not at the
                # end — one chunk of images is the transient bound
                for d in dropped:
                    c.pop(d, None)
            else:
                rows = [dataset[i] for i in idxs]
                keys = set(rows[0])
                for r in rows[1:]:
                    keys &= set(r)
                c = {
                    k: np.stack([np.asarray(r[k]) for r in rows])
                    for k in sorted(keys - dropped)
                    if not isinstance(rows[0][k], (list, str))
                }
            chunks.append(c)
        keys = set(chunks[0])
        for c in chunks[1:]:
            keys &= set(c)
        arrays = {
            k: np.concatenate([c[k] for c in chunks])
            for k in sorted(keys)
            if np.asarray(chunks[0][k]).dtype != object
        }
        if verbose:
            nbytes = sum(v.nbytes for v in arrays.values())
            print(
                f"[device-resident] staged {n}/{n_total} samples, "
                f"{len(arrays)} fields, {nbytes / 2**20:.1f} MiB "
                f"(drop rule: {sorted(drop)})",
                flush=True,
            )
        return cls(
            arrays, batch_size=B, group_size=K, mesh=mesh, shared=shared,
            seed=seed, shuffle=shuffle, index_mode=index_mode,
        )

    def __len__(self) -> int:  # BATCHES per epoch (Trainer schedule unit)
        return self._steps_per_epoch

    def set_epoch(self, epoch: int, skip_batches: int = 0):
        """Sample-level on-device reshuffle for `epoch`; deterministic in
        (seed, epoch). skip_batches resumes mid-epoch (must align to
        group_size)."""
        rng = np.random.default_rng((self.seed, epoch))
        perm = (
            rng.permutation(self._n) if self.shuffle
            else np.arange(self._n)
        )
        if self._multihost:
            # every process computed the SAME perm (deterministic rng);
            # stage it replicated over the mesh so the jitted global
            # gather sees one consistent global argument
            perm_dev = jax.make_array_from_process_local_data(
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec()
                ),
                perm.astype(np.int32),
            )
        else:
            perm_dev = jax.device_put(perm.astype(np.int32))
        # drop the previous epoch's grouped copy BEFORE gathering the new
        # one — with frames resident (r5) the grouped layout is pool-sized,
        # and holding old+new+flat tripled peak HBM
        self._epoch_groups = None
        self._epoch_groups = self._reshuffle(self._flat, perm_dev)
        reps = -(-self._groups // self._groups_nat)  # ceil
        order = np.concatenate([
            rng.permutation(self._groups_nat) if self.shuffle
            else np.arange(self._groups_nat)
            for _ in range(reps)
        ])[: self._groups]
        self._order = order
        if skip_batches % self.group_size:
            raise ValueError(
                f"skip_batches={skip_batches} must align to "
                f"group_size={self.group_size}"
            )
        self._skip_groups = skip_batches // self.group_size

    @property
    def epoch_batches(self):
        """index_mode: the current epoch's flat [S, B, ...] device tree
        (re-gathered by set_epoch); pass to the indexed scan step."""
        return self._epoch_groups

    def __iter__(self):
        skip = self._skip_groups
        self._skip_groups = 0  # one-shot (resume semantics)
        if self.index_mode:
            K = self.group_size
            for g in self._order[skip:]:
                # base batch index of this group in the flat epoch; the
                # Trainer hands it (with epoch_batches) to the indexed
                # scan step — zero dispatches in the loader
                yield {"__group_index__": np.int32(int(g) * K)}
            return
        for g in self._order[skip:]:
            out = dict(self._take_group(self._epoch_groups, np.int32(g)))
            out.update(self._shared)
            yield out
