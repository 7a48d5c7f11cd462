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


def _jv_exact(cost, valid, N, Q):
    """Exact Jonker-Volgenant assignment, in-kernel (VMEM-resident).

    cost [N,Q] f32 (minimize), valid [N,1] bool → person_obj [N,1] i32
    (-1 where a person could not be assigned — only possible when
    #valid persons > Q).

    Vectorized transcription of the classic shortest-augmenting-path
    formulation (our csrc/lapjv.cpp, itself the textbook JV used in place
    of the reference's scipy linear_sum_assignment,
    training/hungarian_matcher.py:79): one Dijkstra phase per person over
    reduced costs with dual potentials (u, v), path reconstruction via
    per-column predecessors. All dynamic indexing is one-hot mask algebra
    (TPU kernels have no cheap scatter/gather); loop carries are i32/f32
    (Mosaic can't legalize i1 vector carries — landmine in
    _auction_kernel's greedy-completion note, r3). Iteration count is
    bounded by structure (≤ Q scans/person, ≤ N+1 augment steps), NOT by
    cost degeneracy — near-ties do not inflate it, which is exactly why
    this is the escalation path for auction bidding wars.
    """
    INF = 1e30  # python scalar (pallas cannot capture jnp constants)
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)  # [1,Q]
    iota_nq = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 0)  # row ids
    iota_qq = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)  # col ids
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)  # [N,1]

    def person_phase(i, carry):
        u, v, owner = carry  # u [N,1] f32, v [1,Q] f32, owner [1,Q] i32

        def run(carry):
            u, v, owner = carry
            minv0 = jnp.full((1, Q), INF, jnp.float32)
            used0 = jnp.zeros((1, Q), jnp.int32)
            way0 = jnp.full((1, Q), -1, jnp.int32)

            def dijkstra_body(st):
                minv, used, way, u_, v_, own_, j0, found, it = st
                used = jnp.where(iota_q == j0, 1, used)
                own_j0 = jnp.sum(jnp.where(iota_q == j0, own_, 0))
                i0 = jnp.where(j0 < 0, i, own_j0)
                row = jnp.min(
                    jnp.where(iota_nq == i0, cost, INF), axis=0, keepdims=True
                )  # [1,Q] = cost[i0]
                u_i0 = jnp.sum(jnp.where(iota_n == i0, u_, 0.0))
                cur = row - u_i0 - v_  # reduced cost from i0
                unused = used == 0
                upd = unused & (cur < minv)
                minv = jnp.where(upd, cur, minv)
                way = jnp.where(upd, j0, way)
                dm = jnp.where(unused, minv, INF)
                delta = jnp.min(dm)
                j1 = jnp.min(jnp.where(dm <= delta, iota_q, Q))
                # dual update: used columns' owners (+ the start row) gain
                # delta; used columns' prices drop; unscanned dists shrink
                used_b = used > 0
                owned_used = jnp.max(
                    jnp.where((iota_nq == own_) & used_b, 1, 0),
                    axis=1, keepdims=True,
                ).astype(jnp.float32)  # [N,1] 1 where row owns a used col
                start_row = (iota_n == i).astype(jnp.float32)
                u_ = u_ + delta * (owned_used + start_row)
                v_ = jnp.where(used_b, v_ - delta, v_)
                minv = jnp.where(unused, minv - delta, minv)
                own_j1 = jnp.sum(jnp.where(iota_q == j1, own_, 0))
                no_col = j1 >= Q  # all columns used — bail (cannot happen
                # while a free column exists; guarded at phase entry)
                found = jnp.where(
                    no_col, 2, jnp.where(own_j1 < 0, 1, 0)
                ).astype(jnp.int32)
                return (minv, used, way, u_, v_, own_, j1, found, it + 1)

            minv, used, way, u_, v_, own_, j_free, found, _ = (
                jax.lax.while_loop(
                    lambda st: jnp.logical_and(st[7] == 0, st[8] <= Q),
                    dijkstra_body,
                    (minv0, used0, way0, u, v, owner, -1, jnp.int32(0),
                     jnp.int32(0)),
                )
            )

            # augment: walk predecessors from the free column back to the
            # start person, shifting ownership along the path (same
            # in-place order as lapjv.cpp:64-68)
            def aug_body(st):
                own2, j, done, it = st
                pj = jnp.sum(jnp.where(iota_q == j, way, 0))  # prev col
                prev_owner = jnp.sum(jnp.where(iota_q == pj, own2, 0))
                new_owner = jnp.where(pj < 0, i, prev_owner)
                own2 = jnp.where(iota_q == j, new_owner, own2)
                done = jnp.where(pj < 0, 1, 0).astype(jnp.int32)
                return (own2, pj, done, it + 1)

            own_final, _, _, _ = jax.lax.while_loop(
                lambda st: jnp.logical_and(st[2] == 0, st[3] <= N + 1),
                aug_body,
                (own_, j_free, jnp.int32(0), jnp.int32(0)),
            )
            # found == 2 (no free column mid-path) never commits: guarded
            # by any_free below and #assignments grows by exactly 1/phase
            return u_, v_, own_final

        valid_i = jnp.sum(jnp.where(iota_n == i, valid.astype(jnp.int32), 0))
        any_free = jnp.any(owner < 0)
        return jax.lax.cond(
            jnp.logical_and(valid_i > 0, any_free),
            run, lambda c: c, (u, v, owner),
        )

    u0 = jnp.zeros((N, 1), jnp.float32)
    v0 = jnp.zeros((1, Q), jnp.float32)
    owner0 = jnp.full((1, Q), -1, jnp.int32)
    _, _, owner = jax.lax.fori_loop(0, N, person_phase, (u0, v0, owner0))
    person_obj = jnp.max(
        jnp.where(iota_nq == owner, iota_qq, -1), axis=1, keepdims=True
    ).astype(jnp.int32)  # [N,1]: column owned by each person, -1 if none
    return person_obj


def _auction_kernel(benefit_ref, valid_ref, eps_ref, out_ref, *, max_iters,
                    escalate=True):
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

    if escalate:
        # Exact escalation (r4, retires the DESIGN §3 capped-matcher
        # divergence): a grid program whose capped phase did NOT converge
        # discards the partial auction state and solves its [N,Q] block
        # EXACTLY with the in-VMEM Jonker-Volgenant solver. The cond is
        # per batch element, so converged elements (every element, once
        # predictions diversify past the first epochs) pay nothing; the
        # degenerate near-tie elements that previously fell to greedy
        # completion now get the reference-exact optimum at a
        # structurally-bounded cost (JV phases don't inflate under
        # near-ties — the very property the auction lacks). Warm-starting
        # JV from auction prices is unsound (ε-CS duals are not feasible
        # for eps=0), hence from-scratch.
        unconverged = jnp.any((person_obj < 0) & valid)
        person_obj = jax.lax.cond(
            unconverged,
            lambda po: _jv_exact(-benefit, valid, N, Q),
            lambda po: po,
            person_obj,
        )
        out_ref[0] = person_obj
        return

    # Greedy completion (escalate=False, kept for A/B measurement):
    # persons the capped phase left unassigned (the
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


@functools.partial(
    jax.jit, static_argnames=("max_iters", "interpret", "escalate")
)
def auction_solve_pallas(
    benefit: jnp.ndarray,
    valid: jnp.ndarray,
    eps: jnp.ndarray,
    *,
    max_iters: int = 1000,
    interpret: bool = False,
    escalate: bool = True,
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
        functools.partial(_auction_kernel, max_iters=max_iters,
                          escalate=escalate),
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
                     "interpret", "escalate"),
)
def auction_match_pallas(
    pred_logits, pred_boxes, tgt_boxes, tgt_labels,
    *, cost_class: float = 1.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
    max_iters: int = 128, interpret=None, escalate: bool = True,
):
    """hungarian_match-compatible API over the Pallas kernel (matcher name
    'auction_pallas'). 0.38 ms vs 12.4 ms exact Hungarian at
    B=32/Q=64/N=48 on v5e.

    On DIVERSE predictions the auction converges in well under 128
    iterations, but the clustered predictions of an early-training
    batch-normalized detector create bidding wars that otherwise thrash
    toward the cap — 22.8 ms of a 25 ms fwd+loss at B=32/256²
    (train_stage_bench r3 investigation). Since r4 the matcher is
    REFERENCE-EXACT in every regime: a batch element still unconverged
    at the cap escalates (per grid program, in-kernel) to the exact
    VMEM-resident Jonker-Volgenant solver (`_jv_exact`), whose iteration
    count is bounded by problem structure rather than cost degeneracy —
    so the degenerate-regime step-time win of the cap survives while the
    assignment equals the Hungarian optimum
    (tests/test_pallas_auction.py::test_escalation_exact_*). Converged
    elements never enter the JV branch. Escalation makes the cap a pure
    COST knob (not a correctness one), so max_iters dropped 300→128,
    the on-chip optimum of benchmarks/matcher_escalation_probe.py's
    sweep (v5e, B=32/Q=64/N=48: diverse 0.85 ms — the sweep minimum —
    and degenerate 11.8 ms vs 13.7 at cap 300; every cap ≥0 measured
    cost-exact vs scipy f64 in both regimes). `escalate=False` restores
    the r3 greedy-completion policy for A/B measurement. ε-scaling was
    the other principled alternative and is measurably unsound for N<Q
    (see the note above)."""
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
    # eps at f32-noise scale (spread·1e-6/N): a converged auction is
    # N·eps-suboptimal, so this choice makes CONVERGED ⇒ EXACT (≤1e-6
    # relative — below the f32 cost-matrix noise floor; max gap measured
    # 0.0 across diverse/col-tie/all-tie fixtures). Convergence speed in
    # the diverse regime is unchanged (bids are gap-driven, v1−v2+eps);
    # genuine near-ties now thrash to the cap instead of converging
    # inexactly, and the cap escalates them to the exact JV solver. The
    # previous spread/100/N left converged elements up to ~4e-5 off the
    # Hungarian optimum (near-tie flips the escalation cond never saw).
    eps = spread * 1e-6 / max(N, 1)
    # interpret=None → trace-time DEFAULT-platform check: the Mosaic
    # kernel needs a TPU; interpret mode keeps the same numerics on CPU
    # (tests, debugging). Placing the computation on a non-default
    # platform (jit(..., device=...)) requires passing interpret
    # explicitly — default_backend() can't see the target device.
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qi = auction_solve_pallas(
        benefit, valid, eps, max_iters=max_iters, interpret=interpret,
        escalate=escalate,
    )
    # The kernel's escalation (or greedy completion when escalate=False)
    # matches every capped-out target, so qi == -1 survives only when
    # #valid targets > Q (no free query left) — those are dropped, never
    # clipped onto query 0 (same policy as auction_match — ops/auction.py)
    valid = valid & (qi >= 0)
    return jnp.clip(qi, 0).astype(jnp.int32), valid
