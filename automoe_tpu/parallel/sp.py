"""Spatial partitioning (sp): shard the image HEIGHT axis over the
'model' mesh axis.

The reference has no counterpart (its DDP replicates every activation —
SURVEY.md §2.2); this is the TPU-native capability for frames too large
for one chip's HBM at a useful batch size: BDD100K's native 1280×720
at B=32 holds ~every trunk activation in fp32; sharding H over k chips
divides activation memory by k while keeping the batch axis free for
data parallelism.

Mechanics are GSPMD — no hand-written halo code:

  * the image enters the jitted step sharded P('data', 'model') on
    (B, H); every conv/pool that follows keeps that layout, and XLA
    inserts the boundary-row halo exchanges (collective-permutes of
    `ceil(k/2)` rows over ICI) that overlapping windows need;
  * BatchNorm's batch statistics are means over (B, H, W) — a sharded-H
    mean lowers to a partial sum + all-reduce over 'model', exactly the
    sync-BN semantics the replicated path computes (equivalence pinned
    in tests/test_sp.py);
  * once downsampling has shrunk H to a few rows per shard, activations
    are GATHERED back to plain P('data') by `spatial_gather_interceptor`
    (a flax method interceptor inserting with_sharding_constraint).
    This is both the perf-correct design — at <4 rows/shard a 3x3
    conv's halo is >=25% of the shard, and the tensors are tiny — and
    a hard CORRECTNESS requirement on this XLA: GSPMD miscompiles the
    BACKWARD of ResNet-style graphs (two-conv main path + strided-conv
    skip, chained) when a spatially-sharded H is SMALLER than the mesh
    axis (padded shards). Forward losses agree to fp noise but
    gradients come out globally ~2.4x wrong (measured: BAD at final
    H=2 on model=4 for 32/64/128-px inputs, OK at H=4 = one unpadded
    row per shard; plain conv chains, fan-outs, BN, resize, and pool
    are each individually correct down to H=1 — only the composed
    residual pattern breaks, with XLA warning "Involuntary full
    rematerialization" on the backward add_any). The interceptor keeps
    every spatially-sharded tensor at >= min_rows_per_shard (default
    4) rows per shard, so the padded-shard regime is never entered.

Composes with DP (batch over 'data', H over 'model') and with TP's
weight sharding — the axes are disjoint. EP and sp both consume the
'model' axis and are exclusive by construction.

Use: `shard_batch_spatial` instead of `shard_batch`, wrap the loss with
`with_spatial_gather`, and build the step with
`make_train_step(..., batch_shardings=None)` so jit honors the committed
spatial layout instead of resharding to P('data'). The train CLI exposes
it as `--spatial --model-axis K` on image workloads (train/cli.py); the
Trainer wires all three pieces when `TrainConfig.spatial` is set.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from automoe_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

#: batch fields spatially sharded on dim 1 (NHWC height) by default
IMAGE_KEYS: Tuple[str, ...] = ("image",)


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] images: batch over 'data', height over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def spatial_batch_shardings(
    batch: Dict[str, Any], mesh: Mesh, image_keys: Iterable[str] = IMAGE_KEYS
) -> Dict[str, NamedSharding]:
    """Per-field shardings: image fields P('data','model'), rest P('data').

    Returns a dict keyed like `batch` — usable both as `device_put`
    target and as the jitted step's batch in_shardings (same pytree
    structure).
    """
    img = spatial_image_sharding(mesh)
    data = NamedSharding(mesh, P(DATA_AXIS))
    out = {}
    for k, v in batch.items():
        if k in image_keys:
            h = np.shape(v)[1]
            if h % mesh.shape[MODEL_AXIS] != 0:
                raise ValueError(
                    f"spatial partitioning needs H ({h}) divisible by the "
                    f"'model' axis ({mesh.shape[MODEL_AXIS]})"
                )
            out[k] = img
        else:
            out[k] = data
    return out


def shard_batch_spatial(
    batch: Dict[str, Any], mesh: Mesh, image_keys: Iterable[str] = IMAGE_KEYS
) -> Dict[str, Any]:
    """Place a host batch onto the mesh with images height-sharded.

    Multi-host: every process passes its LOCAL batch shard (the
    ShardedSampler slice), matching `shard_batch`'s contract — the
    height axis is always fully addressable per process, only the batch
    axis is split across hosts.
    """
    shardings = spatial_batch_shardings(batch, mesh, image_keys)
    multihost = jax.process_count() > 1

    def put(kv):
        k, x = kv
        x = np.asarray(x)
        if multihost:
            return jax.make_array_from_process_local_data(shardings[k], x)
        return jax.device_put(x, shardings[k])

    return {k: put((k, v)) for k, v in batch.items()}


def spatial_gather_interceptor(
    mesh: Mesh, min_rows_per_shard: int = 4
) -> Callable:
    """flax method interceptor: gather small-H activations to P('data').

    Constrains every rank-4 float module output whose H (dim 1) is
    below `min_rows_per_shard * model_axis` to P('data') — replicated
    over 'model'. Downsampling then hands off from spatial partitioning
    to plain DP exactly where halos stop paying for themselves, and the
    XLA padded-spatial-shard backward miscompilation (module docstring)
    is never reachable: no live tensor is ever H-sharded thinner than
    `min_rows_per_shard` full rows per shard.

    `min_rows_per_shard` must be >= 1; 1 is the correctness floor
    (every shard holds a real row), 4 is the perf default.
    """
    if min_rows_per_shard < 1:
        raise ValueError("min_rows_per_shard must be >= 1 (padded "
                         "spatial shards miscompile the backward)")
    model = mesh.shape[MODEL_AXIS]
    thresh = min_rows_per_shard * model
    gathered = NamedSharding(mesh, P(DATA_AXIS))

    def _fix(x):
        if (
            isinstance(x, jax.Array)
            and x.ndim == 4
            and jnp.issubdtype(x.dtype, jnp.floating)
            and x.shape[1] < thresh
        ):
            return jax.lax.with_sharding_constraint(x, gathered)
        return x

    def interceptor(next_fun, args, kwargs, context):
        return jax.tree.map(_fix, next_fun(*args, **kwargs))

    return interceptor


def with_spatial_gather(
    fn: Callable, mesh: Mesh, min_rows_per_shard: int = 4
) -> Callable:
    """Wrap a loss/apply fn so every flax module call inside runs under
    `spatial_gather_interceptor` (the Trainer applies this to the
    workload's loss_fn when cfg.spatial is set)."""
    import flax.linen as nn

    ic = spatial_gather_interceptor(mesh, min_rows_per_shard)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with nn.intercept_methods(ic):
            return fn(*args, **kwargs)

    return wrapped
