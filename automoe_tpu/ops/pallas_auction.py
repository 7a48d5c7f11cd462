"""Pallas TPU kernel for the auction assignment solver.

The jnp auction (`ops/auction.py`) re-materialises the [B,N,Q] value
tensor through HBM on every bidding iteration. This kernel runs ONE batch
element per grid program and keeps the entire solver state — the [N,Q]
benefit block, prices, and the assignment — resident in VMEM for the whole
`while_loop`, so each iteration is pure VPU work with zero HBM traffic.
All indexed updates are expressed as one-hot matrix algebra (TPU has no
cheap scatter/gather inside kernels).

Semantics identical to `_auction_solve` (single small-ε phase); verified
against the exact Hungarian in tests/test_pallas_auction.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # python scalar: jnp constants may not be captured by pallas kernels


# ε-scaling (Bertsekas) was tried for the degenerate-cost thrash an
# untrained detector induces (r3) and REJECTED — the kernel is single-
# phase ON PURPOSE: with price warm-starts across phases the final
# assignment stays ε-CS but the N<Q asymmetry (48 targets binding to 64
# queries) breaks the ε-CS → Nε-optimality argument — coarse phases
# inflate prices of objects that end up unassigned, and forward-auction
# prices never come down (measured: 3 phases = 0.66 suboptimality on a
# 6x8 case whose bound is 0.04; 1 phase exact). Fixing it needs the
# asymmetric auction's unassigned-object price resets, whose extra
# machinery costs more than the thrash it saves here — the iteration cap
# + greedy-completion policy bounds the degenerate case instead.


def _auction_kernel(benefit_ref, valid_ref, eps_ref, out_ref, *, max_iters):
    """One batch element: benefit [N,Q] f32, valid [N,1] i32, eps (1,1) SMEM
    → out [N,1] i32 (assigned object per person)."""
    _, N, Q = benefit_ref.shape
    benefit = benefit_ref[0]  # [N,Q] in VMEM
    valid = valid_ref[0] > 0  # [N,1]
    eps = eps_ref[0, 0, 0]

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)  # col ids
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 0)  # row ids

    def cond(state):
        _, person_obj, it = state
        unassigned = jnp.any((person_obj < 0) & valid)
        return jnp.logical_and(unassigned, it < max_iters)

    def body(state):
        price, person_obj, it = state  # price [1,Q], person_obj [N,1]
        values = benefit - price  # [N,Q] broadcast
        v1 = jnp.max(values, axis=1, keepdims=True)  # [N,1]
        # first argmax per row via iota-min (cumsum not lowered on TPU)
        best_j = jnp.min(
            jnp.where(values >= v1, iota_q, Q), axis=1, keepdims=True
        )  # [N,1]
        best_onehot = iota_q == best_j  # [N,Q]
        v2 = jnp.max(
            jnp.where(best_onehot, _NEG, values), axis=1, keepdims=True
        )
        bid_inc = v1 - v2 + eps  # [N,1]

        bidding = (person_obj < 0) & valid  # [N,1]
        bids = jnp.where(bidding & best_onehot, bid_inc, _NEG)  # [N,Q]
        win_val = jnp.max(bids, axis=0, keepdims=True)  # [1,Q]
        has_bid = win_val > _NEG * 0.5  # [1,Q]
        # winner per object: first row achieving the max (iota-min)
        win_n = jnp.min(
            jnp.where((bids >= win_val) & has_bid, iota_n, N),
            axis=0, keepdims=True,
        )  # [1,Q]
        is_win = (iota_n == win_n) & has_bid

        price = jnp.where(has_bid, price + win_val, price)

        # evict: person holding a re-won object loses it
        holds = (iota_q == person_obj) & (person_obj >= 0)  # [N,Q]
        lost = jnp.any(holds & has_bid, axis=1, keepdims=True)  # [N,1]
        person_obj = jnp.where(lost, -1, person_obj)

        # award: person n wins object j where is_win[n,j]
        new_assign = jnp.max(
            jnp.where(is_win, iota_q, -1), axis=1, keepdims=True
        )  # [N,1]
        person_obj = jnp.where(new_assign >= 0, new_assign, person_obj)
        return price, person_obj, it + 1

    price = jnp.zeros((1, Q), jnp.float32)
    person_obj = jnp.full((N, 1), -1, jnp.int32)
    price, person_obj, _ = jax.lax.while_loop(
        cond, body, (price, person_obj, 0)
    )

    # Greedy completion: persons the capped phase left unassigned (the
    # near-tie bidders that caused the thrash) take their best FREE
    # object, row by row — a no-op when the phase converged. N cheap VPU
    # iterations; keeps the every-target-matched semantics whenever
    # #valid persons <= Q. Same policy as ops/auction.py::_greedy_complete.
    # The loop carry holds `taken` as int32 (0/1), NOT bool: Mosaic fails
    # to legalize an scf.for whose carried value is an i1 vector mask
    # ("failed to legalize operation 'scf.for'", r3 on this toolchain).
    taken = jnp.any(
        (iota_q == person_obj) & (person_obj >= 0), axis=0, keepdims=True
    ).astype(jnp.int32)  # [1,Q] 0/1

    iota_n_col = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)  # [N,1]
    iota_q_row = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)  # [1,Q]

    def complete_body(n, state):
        person_obj, taken = state
        row_n = iota_n_col == n  # [N,1] one-hot row selector
        row_vals = jnp.max(
            jnp.where(iota_n == n, benefit, _NEG), axis=0, keepdims=True
        )  # [1,Q] = benefit[n]
        needs = jnp.any(row_n & (person_obj < 0) & valid)  # scalar
        vals = jnp.where(taken > 0, _NEG, row_vals)  # [1,Q]
        vmax = jnp.max(vals)
        best = jnp.min(jnp.where(vals >= vmax, iota_q_row, Q))  # first argmax
        assign = needs & (vmax > _NEG * 0.5)
        person_obj = jnp.where(row_n & assign, best, person_obj)
        taken = jnp.where(assign & (iota_q_row == best), 1, taken)
        return person_obj, taken

    person_obj, taken = jax.lax.fori_loop(
        0, N, complete_body, (person_obj, taken)
    )
    out_ref[0] = person_obj


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def auction_solve_pallas(
    benefit: jnp.ndarray,
    valid: jnp.ndarray,
    eps: jnp.ndarray,
    *,
    max_iters: int = 1000,
    interpret: bool = False,
) -> jnp.ndarray:
    """benefit [B,N,Q] f32, valid [B,N] bool, eps [B] f32 → [B,N] int32."""
    B, N, Q = benefit.shape
    if Q == 1:
        # degenerate single-object case: the kernel's second-best masked
        # max is -inf, so bidders thrash to max_iters and the winner is
        # arbitrary. The optimal assignment is direct — same shortcut as
        # ops/auction.py's jnp solver.
        vals = jnp.where(valid, benefit[..., 0], jnp.float32(-1e9))
        best_person = jnp.argmax(vals, axis=1)  # [B]
        return jnp.where(
            (jnp.arange(N)[None, :] == best_person[:, None]) & valid, 0, -1
        ).astype(jnp.int32)
    benefit = jnp.where(valid[..., None], benefit, 0.0).astype(jnp.float32)
    valid_i = valid.astype(jnp.int32)[..., None]  # [B,N,1]
    eps2 = eps.reshape(B, 1, 1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_auction_kernel, max_iters=max_iters),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, Q), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 1), jnp.int32),
        interpret=interpret,
    )(benefit, valid_i, eps2)
    return out[..., 0]


@functools.partial(
    jax.jit,
    static_argnames=("cost_class", "cost_bbox", "cost_giou", "max_iters",
                     "interpret"),
)
def auction_match_pallas(
    pred_logits, pred_boxes, tgt_boxes, tgt_labels,
    *, cost_class: float = 1.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
    max_iters: int = 300, interpret=None,
):
    """hungarian_match-compatible API over the Pallas kernel (matcher name
    'auction_pallas'). 0.38 ms vs 12.4 ms exact Hungarian at
    B=32/Q=64/N=48 on v5e.

    max_iters defaults to 300 (was 1000): on DIVERSE predictions the
    auction converges well under 300, but the clustered predictions of
    an early-training batch-normalized detector create bidding wars
    that otherwise thrash toward the cap — 22.8 ms of a 25 ms fwd+loss
    at B=32/256² (train_stage_bench r3 investigation). Targets still
    unassigned at the cap (near-tie bidders whose assignment is least
    informative) are GREEDILY COMPLETED onto free queries inside the
    kernel, so every valid target is matched whenever #targets <= Q —
    the capped matcher never drops targets, it resolves the contested
    near-ties greedily instead (assignment-cost delta vs exact
    Hungarian measured in tests/test_auction.py). ε-scaling was the
    principled alternative and is measurably unsound for N<Q (see
    _EPS_PHASES above)."""
    from automoe_tpu.ops.matching import match_cost_matrix

    pred_logits = jax.lax.stop_gradient(pred_logits)
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    valid = tgt_labels >= 0
    cost = jax.vmap(
        lambda l, b, tb, tl: match_cost_matrix(
            l, b, tb, tl,
            cost_class=cost_class, cost_bbox=cost_bbox, cost_giou=cost_giou,
        )
    )(pred_logits, pred_boxes, tgt_boxes, tgt_labels)
    benefit = -jnp.transpose(cost, (0, 2, 1)).astype(jnp.float32)
    benefit = jnp.where(valid[..., None], benefit, 0.0)
    N = benefit.shape[1]
    spread = jnp.maximum(
        jnp.max(benefit, axis=(1, 2)) - jnp.min(benefit, axis=(1, 2)), 1e-3
    )
    eps = spread / 100.0 / max(N, 1)
    # interpret=None → trace-time DEFAULT-platform check: the Mosaic
    # kernel needs a TPU; interpret mode keeps the same numerics on CPU
    # (tests, debugging). Placing the computation on a non-default
    # platform (jit(..., device=...)) requires passing interpret
    # explicitly — default_backend() can't see the target device.
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qi = auction_solve_pallas(
        benefit, valid, eps, max_iters=max_iters, interpret=interpret,
    )
    # The kernel's greedy completion matches every capped-out target to a
    # free query, so qi == -1 survives only when #valid targets > Q (no
    # free query left) — those are dropped, never clipped onto query 0
    # (same policy as auction_match — see ops/auction.py)
    valid = valid & (qi >= 0)
    return jnp.clip(qi, 0).astype(jnp.int32), valid
