"""Pallas auction kernel (interpret mode on CPU) vs exact assignment."""
from __future__ import annotations

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
def test_pallas_matcher_sweep_vs_hungarian(rng, B, Q, N):
    """Full-matcher sweep (VERDICT r1 #6): detection_set_loss with
    matcher='auction_pallas' matches the exact Hungarian across shapes —
    assignment COST equality is what the ε-optimal auction guarantees
    (individual index permutations with equal cost are fine)."""
    from automoe_tpu.losses.detection import detection_set_loss

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
    np.testing.assert_allclose(float(a["loss"]), float(hg["loss"]),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(
        float(a["bbox_loss"]), float(hg["bbox_loss"]), rtol=5e-3, atol=1e-4
    )
    # every valid target got a unique query
    qi, valid = np.asarray(a["query_idx"]), np.asarray(a["valid"])
    for b in range(B):
        cols = qi[b][valid[b]]
        assert len(set(cols.tolist())) == valid[b].sum()


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
