"""Pallas auction kernel (interpret mode on CPU) vs exact assignment."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from automoe_tpu.ops.pallas_auction import auction_solve_pallas


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
