"""Auction-algorithm assignment: the TPU-fast matcher.

The exact Hungarian (`ops.matching.hungarian_match`, optax) runs
sequential augmenting paths in `lax.while_loop` — measured 12.5 ms per
call at B=32/Q=64/N=48, dominating a detection train step. Bertsekas'
auction algorithm instead does wide, batch-parallel vector work per
iteration (every unassigned target bids simultaneously; conflicts resolve
with a one-hot max over a [B,N,Q] tensor), which is exactly the shape of
compute the VPU/MXU like. With ε = spread/(100·N) the assignment
cost is within N·ε of optimal — empirically exact at matching sizes, and
in any case far below what the DETR-style set loss can distinguish
(parity asserted in tests/test_auction.py).

API-compatible with `hungarian_match`; trainers select it via the
workload's `matcher='auction'` knob.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from automoe_tpu.ops.matching import match_cost_matrix

# numpy, NOT jnp: a module-level jnp scalar (a) initializes the JAX
# backend at import time — breaking jax.distributed.initialize() for every
# multihost entry point — and (b) is a closed-over device constant, the
# dispatch-poison pattern from CLAUDE.md landmine 1.
import numpy as _np

_NEG = _np.float32(-1e9)


def _auction_phase(benefit, valid, price, eps, max_iters):
    """One ε-phase: assign every valid person, starting from `price`.

    benefit [B,N,Q], valid [B,N], price [B,Q], eps [B]. Returns
    (price, person_obj [B,N]).
    """
    B, N, Q = benefit.shape
    if Q == 1:
        # one object: the auction degenerates (top_k(2) is ill-defined and
        # bidders would thrash until max_iters). The optimal assignment is
        # direct: the valid person with max benefit takes object 0.
        vals = jnp.where(valid, benefit[..., 0], _NEG)  # [B,N]
        best_person = jnp.argmax(vals, axis=1)  # [B]
        person_obj = jnp.where(
            (jnp.arange(N)[None, :] == best_person[:, None]) & valid, 0, -1
        ).astype(jnp.int32)
        return price, person_obj

    def cond(state):
        _, person_obj, it = state
        return jnp.logical_and(
            jnp.any((person_obj < 0) & valid), it < max_iters
        )

    def body(state):
        price, person_obj, it = state
        values = benefit - price[:, None, :]  # [B,N,Q]
        top2_v, top2_i = jax.lax.top_k(values, 2)
        best_obj = top2_i[..., 0]  # [B,N]
        bid_inc = top2_v[..., 0] - top2_v[..., 1] + eps[:, None]  # [B,N]

        bidding = (person_obj < 0) & valid  # [B,N]
        onehot = jax.nn.one_hot(best_obj, Q, dtype=benefit.dtype)  # [B,N,Q]
        bids = jnp.where(
            bidding[..., None] & (onehot > 0), bid_inc[..., None], _NEG
        )  # [B,N,Q]
        win_val = jnp.max(bids, axis=1)  # [B,Q]
        win_person = jnp.argmax(bids, axis=1)  # [B,Q]
        has_bid = win_val > _NEG * 0.5

        price = jnp.where(has_bid, price + win_val, price)

        # evict: a person holding an object that was just re-won loses it
        lost = (person_obj >= 0) & jnp.take_along_axis(
            has_bid, jnp.clip(person_obj, 0), axis=1
        )
        person_obj = jnp.where(lost, -1, person_obj)

        # award: winner of object j gets j (each person bids one object)
        award = jnp.where(
            has_bid[:, :, None] & (jax.nn.one_hot(win_person, N, dtype=bool)),
            jnp.arange(Q, dtype=jnp.int32)[None, :, None],
            -1,
        )  # [B,Q,N]
        new_assign = jnp.max(award, axis=1)  # [B,N]
        person_obj = jnp.where(new_assign >= 0, new_assign, person_obj)
        return price, person_obj, it + 1

    person_obj = jnp.full((B, N), -1, jnp.int32)
    price, person_obj, _ = jax.lax.while_loop(
        cond, body, (price, person_obj, jnp.int32(0))
    )
    return price, person_obj


def _greedy_complete(benefit, valid, person_obj):
    """Assign every still-unassigned valid person to its best FREE object.

    benefit [B,N,Q], valid [B,N], person_obj [B,N] (−1 = unassigned) →
    person_obj with no −1 rows left (unless free objects ran out, i.e.
    more valid persons than objects). Runs after a capped auction phase:
    on converged problems every person is already assigned and this is a
    no-op; at the iteration cap it converts would-be target DROPS into
    greedy matches. The persons left unassigned at the cap are exactly
    the near-tie bidders (that is why the auction thrashed), so greedy
    resolution costs ~0 assignment quality — measured vs exact Hungarian
    in tests/test_auction.py::test_capped_auction_greedy_completion.
    """
    B, N, Q = benefit.shape
    taken = jnp.any(
        jax.nn.one_hot(person_obj, Q, dtype=bool)
        & (person_obj >= 0)[..., None],
        axis=1,
    )  # [B,Q]

    def body(n, state):
        person_obj, taken = state
        needs = (person_obj[:, n] < 0) & valid[:, n]  # [B]
        vals = jnp.where(taken, _NEG, benefit[:, n, :])  # [B,Q]
        best = jnp.argmax(vals, axis=1)  # [B]
        free = jnp.max(vals, axis=1) > _NEG * 0.5  # [B]
        assign = needs & free
        person_obj = person_obj.at[:, n].set(
            jnp.where(assign, best.astype(jnp.int32), person_obj[:, n])
        )
        taken = taken | (
            assign[:, None] & (jnp.arange(Q)[None, :] == best[:, None])
        )
        return person_obj, taken

    person_obj, _ = jax.lax.fori_loop(0, N, body, (person_obj, taken))
    return person_obj


def _auction_solve(benefit, valid, *, eps_fraction=1e-2, max_iters=1000):
    """Single-phase auction with ε = spread·eps_fraction/N.

    benefit [B,N,Q] (maximize), valid [B,N] → assigned object per person
    [B,N]. At DETR-matching sizes (N ≤ 64, Q ≤ 256) a single small-ε phase
    converges in a few dozen vectorized iterations and is empirically
    exact (ε-scaling phases were both slower and unnecessary here).
    """
    B, N, Q = benefit.shape
    benefit = jnp.where(valid[..., None], benefit, 0.0)
    spread = jnp.maximum(
        jnp.max(benefit, axis=(1, 2)) - jnp.min(benefit, axis=(1, 2)), 1e-3
    )  # [B]
    eps = spread * eps_fraction / jnp.maximum(N, 1)
    price = jnp.zeros((B, Q), benefit.dtype)
    _, person_obj = _auction_phase(benefit, valid, price, eps, max_iters)
    if Q > 1:
        # no-op when the phase converged; completes capped runs greedily
        person_obj = _greedy_complete(benefit, valid, person_obj)
    return person_obj


@functools.partial(
    jax.jit,
    static_argnames=("cost_class", "cost_bbox", "cost_giou",
                     "eps_fraction", "max_iters"),
)
def auction_match(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    tgt_boxes: jnp.ndarray,
    tgt_labels: jnp.ndarray,
    *,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    eps_fraction: float = 1e-2,
    max_iters: int = 1000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in near-optimal replacement for hungarian_match (same API)."""
    # matching is non-differentiable target construction (the reference
    # matcher is @torch.no_grad, hungarian_matcher.py:20); stop gradients
    # so the price-iteration while_loop never needs a transpose rule
    pred_logits = jax.lax.stop_gradient(pred_logits)
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    valid = tgt_labels >= 0
    cost = jax.vmap(
        lambda l, b, tb, tl: match_cost_matrix(
            l, b, tb, tl,
            cost_class=cost_class, cost_bbox=cost_bbox, cost_giou=cost_giou,
        )
    )(pred_logits, pred_boxes, tgt_boxes, tgt_labels)  # [B, Q, N]
    benefit = -jnp.transpose(cost, (0, 2, 1)).astype(jnp.float32)  # [B,N,Q]
    query_idx = _auction_solve(
        benefit, valid, eps_fraction=eps_fraction, max_iters=max_iters,
    )
    # A capped phase leaves its near-tie bidders unassigned; greedy
    # completion (inside _auction_solve) matches them to free queries, so
    # every valid target is matched whenever #targets <= Q — matching the
    # reference's every-target-matched semantics. The guard below only
    # fires in the #valid-targets > Q corner (no free query left), where
    # dropping is the only sound option (never clip onto query 0, which
    # would fabricate duplicate matches — ADVICE r1).
    valid = valid & (query_idx >= 0)
    return jnp.clip(query_idx, 0).astype(jnp.int32), valid
