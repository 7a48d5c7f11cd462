"""Device mesh + sharding helpers — the TPU replacement for the
reference's NCCL/DDP plumbing.

Every `dist.*` call site in the reference (init_process_group,
DistributedSampler, DDP gradient allreduce, all_reduce of val stats —
SURVEY.md §2.2) maps onto one idiom here: a named `jax.sharding.Mesh`
('data', 'model') plus `jax.jit` with NamedShardings. Parameters are
replicated, batches are sharded over 'data', and XLA inserts the gradient
all-reduce over ICI automatically — there is no hand-written comm code to
get wrong. The 'model' axis is reserved for tensor-parallel sharding of
larger future models (unused by the reference-scale models, wired through
so `dryrun_multichip` exercises a 2-D mesh).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh then spans all processes and `process_index() == 0` replaces the
reference's rank-0 guards.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. -1 = absorb all remaining devices."""

    data: int = -1
    model: int = 1


def make_mesh(
    spec: MeshSpec = MeshSpec(), devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = spec.model if spec.model > 0 else 1
    data = spec.data if spec.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding (the DistributedSampler replacement)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a [K, B, ...] stack of K batches (scan-steps training):
    replicated over K, data-sharded over the per-step batch axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_stacked_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a [K, B, ...] host batch stack onto the mesh (axis 1 = data).
    Multi-host: each process passes its LOCAL [K, B_local, ...] stack."""
    sharding = stacked_batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the batch axis.

    Batch dim must divide by the data-axis size (fixed-shape padded batches
    guarantee this). Multi-host: each process passes its LOCAL shard (the
    ShardedSampler slice) and the pieces assemble into one global array via
    make_array_from_process_local_data — the jax equivalent of every DDP
    rank consuming its DistributedSampler slice.
    """
    sharding = batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
