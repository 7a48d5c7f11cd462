"""Tensor-parallel parameter sharding over the 'model' mesh axis.

The reference models are ResNet-18-scale and need only data parallelism,
but the framework keeps a 'model' axis live: wide kernels (Dense/conv
output channels ≥ `min_dim`, divisible by the axis size) are sharded over
it and XLA GSPMD inserts the all-gathers/reduce-scatters. This is the
growth path to larger experts without touching the training loop.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from automoe_tpu.parallel.mesh import MODEL_AXIS


def _leaf_spec(x, model_size: int, min_dim: int) -> P:
    shape = getattr(x, "shape", ())
    if (
        len(shape) >= 2
        and shape[-1] >= min_dim
        and shape[-1] % model_size == 0
        and model_size > 1
    ):
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def state_shardings(state: Any, mesh: Mesh, *, min_dim: int = 512):
    """NamedSharding pytree for a TrainState: wide kernels → model axis,
    everything else replicated. Adam moments share param shapes, so the
    same rule shards them consistently."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(x):
        return NamedSharding(mesh, _leaf_spec(x, model_size, min_dim))

    return jax.tree.map(rule, state)


def shard_state(state: Any, mesh: Mesh, *, min_dim: int = 512) -> Tuple[Any, Any]:
    sh = state_shardings(state, mesh, min_dim=min_dim)
    return jax.device_put(state, sh), sh
