"""Pipeline parallelism (pp): stage-partitioned blocks over the 'model'
mesh axis, GPipe-style microbatching, XLA collectives for the hops.

The reference has no counterpart (its DDP replicates the whole model —
SURVEY.md §2.2 lists PP as absent); like tp.py this is a growth-path
capability: the reference-scale models (ResNet-18 trunks) fit one chip
comfortably, but a framework meant for larger trunks needs a way to
split DEPTH across chips when width-sharding (tp) stops scaling.

TPU-native shape of the implementation — no schedule runtime, no
send/recv threads, ~60 lines of traced code:

  * the pipeline is a `lax.scan` over S+M-1 ticks inside `shard_map`;
    each tick every device applies ITS stage's block to its current
    buffer and the buffers rotate one stage forward via
    `lax.ppermute` over ICI;
  * stage 0 feeds a fresh microbatch each tick (zero-padded during the
    drain), stage S-1's outputs are collected via a masked `psum`;
  * the BACKWARD schedule is not hand-written: `jax.grad` of the traced
    scan + ppermute graph IS the reverse pipeline (ppermute transposes
    to the opposite rotation, the feed-gather transposes to a
    scatter-add). Forward/backward equivalence vs running the S blocks
    sequentially is pinned in tests/test_pp.py.

Constraints (documented, enforced):
  * blocks are shape-preserving `[mb, ...] -> [mb, ...]` maps (a
    residual trunk; embed/head stages run outside the pipeline);
  * per-microbatch independence — a block must not couple samples
    across the batch (BatchNorm train-mode stats would become
    per-microbatch; use it for norm-free or frozen-stat trunks);
  * batch divisible by `microbatches`, microbatch count >= 1. Bubble
    fraction is (S-1)/(S-1+M) — pick M >= 4*S for <20% bubble.

Composes with DP: shard_map runs over BOTH axes, each 'data' row runs
its own pipeline over 'model'. Exclusive with sp/ep/tp (all consume
'model').

Use: stack per-stage params on a leading [S, ...] axis, place them with
`stage_param_sharding(mesh)`, and call `pipeline_apply(block_fn,
stacked, x, mesh, microbatches=M)`.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from automoe_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stage_param_sharding(mesh: Mesh) -> NamedSharding:
    """Placement for [S, ...]-stacked per-stage params: stage s of every
    leaf lives only on the 'model'-axis-s devices."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def pipeline_apply(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: Mesh,
    *,
    microbatches: int,
    remat: bool = True,
):
    """y = block_S(...block_2(block_1(x))), stages pipelined over 'model'.

    stacked_params: pytree whose leaves carry a leading [S] stage axis
    (S = mesh 'model' size), placed with `stage_param_sharding`.
    x: [B, ...] with B divisible by (data_axis * microbatches).
    block_fn(params_s, h) -> h', shape-preserving, sample-independent.

    remat (default on — GPipe's memory profile): `jax.checkpoint` the
    per-tick stage application, so the backward stashes only the stage
    INPUT per tick ([T, mb, ...] boundaries) and recomputes the stage's
    internal activations — without it the scan's VJP keeps every conv/
    norm intermediate of every tick live, which for a 64-block 512-wide
    trunk is ~4x 7.5 GiB/device (measured via the v5e-8 deviceless AOT,
    tests/test_deep_policy.py::test_aot_v5e_pp_memory_growth_path); cost
    is one extra stage forward per tick in the backward. Values are
    bit-identical (same ops, same order).

    Returns y with x's shape, sharded like the input batch (P('data')).
    """
    S = mesh.shape[MODEL_AXIS]
    B = x.shape[0]
    data = mesh.shape[DATA_AXIS]
    if microbatches < 1:
        raise ValueError("microbatches must be >= 1")
    if B % (data * microbatches):
        raise ValueError(
            f"batch {B} must divide by data axis ({data}) x microbatches "
            f"({microbatches})"
        )

    def local(params, xb):
        # params leaves [1, ...] (this device's stage); xb [B_loc, ...]
        params = jax.tree.map(lambda p: p[0], params)
        mb = xb.shape[0] // microbatches
        xs = xb.reshape((microbatches, mb) + xb.shape[1:])
        drain = jnp.zeros((S - 1,) + xs.shape[1:], xs.dtype)
        feed = jnp.concatenate([xs, drain], axis=0)  # [T, mb, ...]
        idx = jax.lax.axis_index(MODEL_AXIS)
        rot = [(i, (i + 1) % S) for i in range(S)]
        apply_stage = jax.checkpoint(block_fn) if remat else block_fn

        def tick(cur, feed_t):
            cur = jnp.where(idx == 0, feed_t, cur)
            y = apply_stage(params, cur)
            nxt = jax.lax.ppermute(y, MODEL_AXIS, rot)
            return nxt, y

        init = jnp.zeros_like(feed[0])
        _, ys = jax.lax.scan(tick, init, feed)  # ys [T, mb, ...]
        # collect stage S-1's emissions; psum broadcasts them to every
        # stage so the result leaves shard_map replicated over 'model'.
        # jnp.where, NOT ys * mask: drain ticks run block_fn on zero
        # buffers, and a block non-finite at 0 (rsqrt-norms, log) would
        # turn mask*inf into NaN and psum it into real outputs
        ys = jax.lax.psum(
            jnp.where(idx == S - 1, ys, jnp.zeros((), ys.dtype)), MODEL_AXIS
        )
        out = ys[S - 1:]  # [M, mb, ...] — microbatch m finishes at tick m+S-1
        return out.reshape(xb.shape)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(stacked_params, x)


def grouped_pipeline_apply(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: Mesh,
    *,
    microbatches: int,
    remat: bool = True,
):
    """`pipeline_apply` for trunks DEEPER than the mesh: leaves carry a
    leading [L] block axis with L a multiple of S = mesh 'model' size;
    blocks fold into S pipeline stages of L/S consecutive blocks each
    (stage s owns blocks [s*L/S, (s+1)*L/S) — exactly the contiguous
    split a leading-axis P('model') placement gives, so `pp_shard_state`
    params reshape shard-locally, no resharding collective).

    This is the entry the product deep-policy trunk uses
    (models/deep_policy.py); L == S degenerates to `pipeline_apply`.
    """
    S = mesh.shape[MODEL_AXIS]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"block count {L} must divide by the mesh "
                         f"'model' axis ({S})")
    per = L // S
    regrouped = jax.tree.map(
        lambda p: p.reshape((S, per) + p.shape[1:]), stacked_params
    )

    def stage_fn(params_stage, h):
        # params_stage leaves [L/S, ...]: this stage's consecutive blocks
        return sequential_apply(block_fn, params_stage, h)

    return pipeline_apply(stage_fn, regrouped, x, mesh,
                          microbatches=microbatches, remat=remat)


def pp_state_shardings(state: Any, mesh: Mesh, *, token: str = None):
    """NamedSharding pytree for a TrainState whose model carries
    [L]-stacked pipeline-trunk params: every leaf whose tree path
    contains `token` (default: models/deep_policy.py::PIPELINE_BLOCKS)
    is split on its leading axis over 'model' (stage s's blocks +
    optimizer moments live only on stage s's devices); everything else
    is replicated. Composes with the optimizer state because Adam
    moments mirror the param tree paths."""
    if token is None:
        from automoe_tpu.models.deep_policy import PIPELINE_BLOCKS as token
    stage = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())

    def rule(path, x):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        return stage if token in keys else repl

    return jax.tree_util.tree_map_with_path(rule, state)


def pp_shard_state(state: Any, mesh: Mesh):
    sh = pp_state_shardings(state, mesh)
    return jax.device_put(state, sh), sh


def sequential_apply(block_fn, stacked_params, x):
    """Reference semantics of `pipeline_apply`: the S blocks in a row on
    one device (tests pin pipeline == sequential, fwd and grad)."""
    S = jax.tree.leaves(stacked_params)[0].shape[0]

    def body(h, s):
        params = jax.tree.map(lambda p: p[s], stacked_params)
        return block_fn(params, h), None

    h, _ = jax.lax.scan(body, x, jnp.arange(S))
    return h


def mlp_block(params, h):
    """Demo/growth-path stage: norm-free residual FFN block
    `h + relu(h W1 + b1) W2 + b2` — the repeated-block trunk shape pp
    exists for (sample-independent, shape-preserving)."""
    return (
        h
        + jnp.maximum(h @ params["w1"] + params["b1"], 0.0) @ params["w2"]
        + params["b2"]
    )


def init_mlp_stack(rng, stages: int, dim: int, hidden: int):
    """[S]-stacked params for `mlp_block` (host numpy, place with
    stage_param_sharding)."""
    import numpy as np

    r = np.random.default_rng(rng)
    scale1 = (2.0 / dim) ** 0.5
    scale2 = (2.0 / hidden) ** 0.5
    return {
        "w1": (r.normal(size=(stages, dim, hidden)) * scale1).astype(
            np.float32
        ),
        "b1": np.zeros((stages, hidden), np.float32),
        "w2": (r.normal(size=(stages, hidden, dim)) * scale2).astype(
            np.float32
        ),
        "b2": np.zeros((stages, dim), np.float32),
    }
