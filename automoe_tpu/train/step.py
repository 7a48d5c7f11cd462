"""Generic jitted train/eval steps over a device mesh.

One `make_train_step` serves every workload (the reference re-wires this
logic in five separate trainer scripts). Data parallelism is GSPMD: the
state is replicated, the batch is sharded over the 'data' mesh axis, and
XLA emits the gradient all-reduce over ICI during the backward pass — the
TPU equivalent of DDP's bucketed NCCL allreduce, but fused and
compiler-scheduled.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh

from automoe_tpu.parallel.mesh import (
    batch_sharding,
    replicate,
    stacked_batch_sharding,
)

# loss_fn(params, batch_stats, batch, rng, train) ->
#   (loss, (metrics, new_batch_stats))
LossFn = Callable[..., Tuple[jax.Array, Tuple[Dict[str, jax.Array], Any]]]


def _train_body(loss_fn: LossFn, state, batch, rng):
    """One optimizer step: grad of loss_fn, apply, return (state, metrics).
    The per-step RNG folds in state.step, so a scan over this body and a
    sequence of single-step dispatches draw identical randomness."""
    rng = jax.random.fold_in(rng, state.step)

    def wrapped(params):
        return loss_fn(params, state.batch_stats, batch, rng, True)

    (loss, (metrics, new_stats)), grads = jax.value_and_grad(
        wrapped, has_aux=True
    )(state.params)
    new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
    metrics = dict(metrics)
    metrics["loss"] = loss
    return new_state, metrics


# sentinel: batch_shardings left at the default → shard P('data').
# Passing None instead means "infer from the argument's committed
# sharding" (jit's None semantics) — how spatial partitioning enters:
# `parallel.sp.shard_batch_spatial` commits images to P('data','model')
# and the step honors that layout instead of resharding to P('data').
_DEFAULT_BATCH = object()


def make_train_step(
    loss_fn: LossFn,
    mesh: Optional[Mesh] = None,
    state_sharding: Any = None,
    batch_shardings: Any = _DEFAULT_BATCH,
):
    def train_step(state, batch, rng):
        return _train_body(loss_fn, state, batch, rng)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = replicate(mesh)
    data = (
        batch_sharding(mesh) if batch_shardings is _DEFAULT_BATCH
        else batch_shardings
    )
    state_sh = state_sharding if state_sharding is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_scan_train_step(
    loss_fn: LossFn,
    mesh: Optional[Mesh] = None,
    state_sharding: Any = None,
):
    """K optimizer steps per dispatch: `lax.scan` of the train body over a
    STACKED batch pytree [K, B, ...]. One host dispatch + one metrics
    fetch amortize over K steps — the reference's per-step Python loop
    (training/train_bdd100k_ddp.py:150-194) pays that host cost every
    step and can't express this. Costs K batches of HBM for inputs;
    metrics come back stacked [K]. K is the leading dim of the batches
    (a new K recompiles — keep it fixed per run)."""

    def scan_step(state, batches, rng):
        def body(st, batch):
            return _train_body(loss_fn, st, batch, rng)

        return jax.lax.scan(body, state, batches)

    if mesh is None:
        return jax.jit(scan_step, donate_argnums=(0,))

    repl = replicate(mesh)
    data = stacked_batch_sharding(mesh)
    state_sh = state_sharding if state_sharding is not None else repl
    return jax.jit(
        scan_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_indexed_scan_train_step(
    loss_fn: LossFn,
    k: int,
    mesh: Optional[Mesh] = None,
    state_sharding: Any = None,
):
    """`make_scan_train_step` that slices its own batches out of a
    device-resident epoch INSIDE the jitted program (r5): the caller
    passes the loader's whole flat-batch tree [S, B, ...] plus a scalar
    base index, and the scan body dynamic-slices batch g0+i per
    iteration. vs. the two-program path (a jitted group gather
    producing a [K,B,...] copy, then the scan step) this saves one host
    dispatch per group and the full group-sized HBM copy between
    programs — on the v5e cached-gating pipeline the copy alone was
    ~4 ms against the 73 ms group. The epoch tree is NOT donated (it is
    reused by every group); only the state is.

    Semantics are identical to make_scan_train_step on the same batch
    sequence: same _train_body, same per-step RNG fold of state.step
    (pinned by tests/test_device_resident.py::
    test_indexed_scan_matches_pre_grouped)."""
    import jax.numpy as jnp

    def indexed_step(state, epoch_batches, g0, rng):
        def body(st, idx):
            batch = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, idx, axis=0, keepdims=False
                ),
                epoch_batches,
            )
            return _train_body(loss_fn, st, batch, rng)

        return jax.lax.scan(
            body, state, g0 + jnp.arange(k, dtype=jnp.int32)
        )

    if mesh is None:
        return jax.jit(indexed_step, donate_argnums=(0,))

    repl = replicate(mesh)
    data = batch_sharding(mesh)  # [S, B, ...]: batch axis is dim 1
    from jax.sharding import NamedSharding, PartitionSpec as P

    flat = NamedSharding(mesh, P(None, "data"))
    state_sh = state_sharding if state_sharding is not None else repl
    del data
    return jax.jit(
        indexed_step,
        in_shardings=(state_sh, flat, repl, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_grad_accum_train_step(
    loss_fn: LossFn,
    mesh: Optional[Mesh] = None,
    state_sharding: Any = None,
):
    """ONE optimizer step from K accumulated microbatch gradients: a
    `lax.scan` over a stacked [K, mb, ...] batch group sums per-
    microbatch mean gradients and applies their average once — the
    effective batch is K×mb with only mb of activations live at a time.
    The reference has no counterpart (its DDP trainers scale batch only
    by adding GPUs); combined with `--remat` this is the memory story
    for batch sizes one chip can't hold.

    Semantics (deliberate, torch-matching): equal-size microbatches make
    the averaged gradient EXACTLY the full-batch mean gradient, but
    train-mode BatchNorm normalizes each microbatch by its OWN
    statistics and updates running stats once per microbatch — the same
    composition torch users get when they accumulate with BN (and the
    same as non-sync-BN DP over K devices). Pinned against a manual
    two-grad average in tests/test_grad_accum.py. The per-microbatch RNG
    folds in the microbatch index, so dropout draws differ across the
    group; the fold of state.step keeps whole-group randomness aligned
    with the single-step path's per-optimizer-step stream."""
    import jax.numpy as jnp

    def accum_step(state, batches, rng):
        rng = jax.random.fold_in(rng, state.step)
        k = jax.tree.leaves(batches)[0].shape[0]

        def micro(params, stats, batch, r):
            def wrapped(p):
                return loss_fn(p, stats, batch, r, True)

            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                wrapped, has_aux=True
            )(params)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return grads, metrics, new_stats

        first = jax.tree.map(lambda x: x[0], batches)
        rest = jax.tree.map(lambda x: x[1:], batches)
        gsum, msum, stats = micro(
            state.params, state.batch_stats, first, jax.random.fold_in(rng, 0)
        )

        def body(carry, xs):
            stats, gsum, msum = carry
            batch, idx = xs
            g, m, new_stats = micro(
                state.params, stats, batch, jax.random.fold_in(rng, idx)
            )
            return (
                new_stats,
                jax.tree.map(jnp.add, gsum, g),
                jax.tree.map(jnp.add, msum, m),
            ), None

        (stats, gsum, msum), _ = jax.lax.scan(
            body, (stats, gsum, msum), (rest, jnp.arange(1, k))
        )
        grads = jax.tree.map(lambda g: g / k, gsum)
        metrics = jax.tree.map(lambda m: m / k, msum)
        new_state = state.apply_gradients(grads, new_batch_stats=stats)
        return new_state, metrics

    if mesh is None:
        return jax.jit(accum_step, donate_argnums=(0,))

    repl = replicate(mesh)
    data = stacked_batch_sharding(mesh)
    state_sh = state_sharding if state_sharding is not None else repl
    return jax.jit(
        accum_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_eval_step(
    loss_fn: LossFn,
    mesh: Optional[Mesh] = None,
    batch_shardings: Any = _DEFAULT_BATCH,
    state_sharding: Any = None,
):
    def eval_step(state, batch, rng):
        loss, (metrics, _) = loss_fn(state.params, state.batch_stats, batch, rng, False)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    if mesh is None:
        return jax.jit(eval_step)
    repl = replicate(mesh)
    data = (
        batch_sharding(mesh) if batch_shardings is _DEFAULT_BATCH
        else batch_shardings
    )
    state_sh = state_sharding if state_sharding is not None else repl
    return jax.jit(
        eval_step, in_shardings=(state_sh, data, repl), out_shardings=repl
    )
