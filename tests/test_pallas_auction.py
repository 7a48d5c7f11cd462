"""Pallas auction kernel (interpret mode on CPU) vs exact assignment."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from automoe_tpu.ops.pallas_auction import auction_solve_pallas


@pytest.mark.parametrize("B,Q,N", [
    (2, 16, 8),
    (4, 64, 48),
    (2, 64, 16),
    (1, 256, 32),
    (3, 36, 36),
])
def test_pallas_matcher_sweep_vs_hungarian(B, Q, N):
    """Full-matcher sweep (VERDICT r1 #6): the ε-optimal guarantee is
    total assignment COST within n·ε of the exact Hungarian — asserted
    directly on the cost matrix — plus unique assignments and a loss that
    tracks the Hungarian one. (Deterministic per-shape rng: the tight
    Q≈N cases are sensitive to the draw.)"""
    from automoe_tpu.losses.detection import detection_set_loss
    from automoe_tpu.ops.boxes import box_convert
    from automoe_tpu.ops.matching import match_cost_matrix

    rng = np.random.default_rng(10_000 + 7 * B + 13 * Q + 17 * N)
    C = 10
    logits = jnp.asarray(rng.normal(size=(B, Q, C)).astype(np.float32))
    h = int(np.sqrt(Q))
    assert h * h == Q
    logits = logits.reshape(B, h, h, C)
    deltas = jnp.asarray(
        rng.uniform(0.05, 0.95, (B, h, h, 4)).astype(np.float32)
    )
    n_real = max(1, N // 2)
    gt = np.zeros((B, N, 4), np.float32)
    x1 = rng.uniform(0.05, 0.5, (B, N, 2))
    gt[..., :2] = x1
    gt[..., 2:] = x1 + rng.uniform(0.05, 0.4, (B, N, 2))
    lb = np.where(
        np.arange(N)[None, :] < n_real,
        rng.integers(0, C, (B, N)), -1,
    ).astype(np.int32)
    kw = dict(num_classes=C)
    a = detection_set_loss(
        logits, deltas, jnp.asarray(gt), jnp.asarray(lb),
        matcher="auction_pallas", **kw,
    )
    hg = detection_set_loss(
        logits, deltas, jnp.asarray(gt), jnp.asarray(lb),
        matcher="hungarian", **kw,
    )
    # loss tracks the Hungarian one (ε-approximation can move individual
    # matches on tight Q≈N instances; 2% covers that)
    np.testing.assert_allclose(float(a["loss"]), float(hg["loss"]),
                               rtol=2e-2, atol=1e-3)

    # the actual ε-optimality guarantee: total assignment cost within
    # n_valid·ε of the exact optimum (ε = spread/100/N, ops/pallas_auction)
    tgt_cxcywh = box_convert(jnp.asarray(gt), "xyxy", "cxcywh")
    cost = np.asarray(jax.vmap(
        lambda l, bx, tb, tl: match_cost_matrix(l, bx, tb, tl)
    )(logits.reshape(B, Q, C), deltas.reshape(B, Q, 4),
      tgt_cxcywh, jnp.asarray(lb)))  # [B,Q,N]
    qi, valid = np.asarray(a["query_idx"]), np.asarray(a["valid"])
    qh, vh = np.asarray(hg["query_idx"]), np.asarray(hg["valid"])
    for b in range(B):
        rows = np.where(valid[b])[0]
        cols = qi[b][rows]
        assert len(set(cols.tolist())) == len(rows), "duplicate assignment"
        ours = cost[b][cols, rows].sum()
        opt = cost[b][qh[b][np.where(vh[b])[0]], np.where(vh[b])[0]].sum()
        spread = cost[b].max() - cost[b].min()
        slack = len(rows) * spread / 100.0 / N + 1e-4
        assert ours - opt <= slack, (b, ours, opt, slack)


def test_pallas_auction_interpret_matches_optimal(rng):
    B, N, Q = 4, 8, 16
    cost = rng.uniform(0, 10, (B, N, Q)).astype(np.float32)
    benefit = jnp.asarray(-cost)
    valid_np = np.ones((B, N), bool)
    valid_np[1, 5:] = False
    valid_np[2, :] = False
    valid = jnp.asarray(valid_np)
    spread = (cost.max(axis=(1, 2)) - cost.min(axis=(1, 2))).astype(np.float32)
    eps = jnp.asarray(spread / 100.0 / N)

    out = np.asarray(
        auction_solve_pallas(benefit, valid, eps, interpret=True)
    )
    for b in range(B):
        n = int(valid_np[b].sum())
        if n == 0:
            continue
        rows = np.where(valid_np[b])[0]
        sub = cost[b][rows]
        cols = out[b][rows]
        assert len(set(cols.tolist())) == n
        ri, ci = linear_sum_assignment(sub.astype(np.float64))
        ours = sub[np.arange(n), cols].sum()
        opt = sub[ri, ci].sum()
        assert ours - opt <= spread[b] * 0.011 + 1e-4, (b, ours, opt)


def test_escalation_exact_random(rng):
    """max_iters=0 forces EVERY element through the in-kernel JV
    escalation: the assignment must equal the scipy optimum exactly
    (cost-equal; permutations may differ among ties), incl. partially
    valid and fully invalid rows."""
    B, N, Q = 5, 12, 20
    cost = rng.uniform(0, 10, (B, N, Q)).astype(np.float32)
    benefit = jnp.asarray(-cost)
    valid_np = np.ones((B, N), bool)
    valid_np[1, 7:] = False
    valid_np[2, :] = False
    valid_np[3, ::2] = False
    valid = jnp.asarray(valid_np)
    eps = jnp.asarray(np.full(B, 0.01, np.float32))

    out = np.asarray(
        auction_solve_pallas(benefit, valid, eps, max_iters=0, interpret=True)
    )
    for b in range(B):
        rows = np.where(valid_np[b])[0]
        if len(rows) == 0:
            assert (out[b] == -1).all()
            continue
        sub = cost[b][rows]
        cols = out[b][rows]
        assert (cols >= 0).all(), (b, cols)
        assert len(set(cols.tolist())) == len(rows), "duplicate"
        assert (out[b][~valid_np[b]] == -1).all(), "invalid row assigned"
        ri, ci = linear_sum_assignment(sub.astype(np.float64))
        ours = sub[np.arange(len(rows)), cols].sum()
        opt = sub[ri, ci].sum()
        assert abs(ours - opt) <= 1e-4, (b, ours, opt)


def test_escalation_exact_degenerate():
    """The degenerate near-tie regime that motivated the r3 cap: at the
    DEFAULT cap (128) the full matcher must now return the reference-exact
    optimum — zero dropped targets, zero greedy divergence (retires the
    DESIGN §3 capped-matcher ledger row)."""
    from automoe_tpu.ops.matching import match_cost_matrix
    from automoe_tpu.ops.pallas_auction import auction_match_pallas

    rng = np.random.default_rng(4242)
    B, Q, C, N, noise = 4, 64, 10, 48, 1e-3
    base_logit = rng.normal(size=(1, 1, C)).astype(np.float32)
    base_box = np.array([[0.4, 0.4, 0.6, 0.6]], np.float32)
    logits = jnp.asarray(
        base_logit + noise * rng.normal(size=(B, Q, C)).astype(np.float32))
    boxes = jnp.asarray(np.clip(
        base_box + noise * rng.normal(size=(B, Q, 4)).astype(np.float32),
        0, 1))
    tb = jnp.asarray(rng.uniform(0.1, 0.9, (B, N, 4)).astype(np.float32))
    tl = jnp.asarray(rng.integers(0, C, (B, N)).astype(np.int32))

    qi, valid = auction_match_pallas(logits, boxes, tb, tl, interpret=True)
    qi, valid = np.asarray(qi), np.asarray(valid)
    assert valid.all(), "escalated matcher dropped targets"
    for b in range(B):
        cols = qi[b]
        assert len(set(cols.tolist())) == N, "duplicate"
        cost = np.asarray(match_cost_matrix(logits[b], boxes[b], tb[b], tl[b]))
        ri, ci = linear_sum_assignment(cost.astype(np.float64))
        ours = cost[cols, np.arange(N)].sum()
        opt = cost[ri, ci].sum()
        # near-ties: every optimum is within float noise of each other,
        # so cost equality is the right exactness criterion
        assert abs(ours - opt) <= 1e-4, (b, ours, opt)


def test_pallas_auction_single_query(rng):
    """Q=1 degenerate case: the kernel used to thrash to max_iters and
    return an arbitrary bidder; now the optimal target takes the query
    (same shortcut as the jnp solver)."""
    from automoe_tpu.ops.pallas_auction import auction_solve_pallas

    benefit = jnp.asarray([[[0.9], [0.1], [0.5]]], jnp.float32)  # [1,3,1]
    valid = jnp.asarray([[True, True, True]])
    out = auction_solve_pallas(
        benefit, valid, jnp.asarray([0.01], jnp.float32), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), [[0, -1, -1]])
    # all-invalid row: nothing assigned
    out2 = auction_solve_pallas(
        benefit, jnp.zeros((1, 3), bool), jnp.asarray([0.01], jnp.float32),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out2), [[-1, -1, -1]])
