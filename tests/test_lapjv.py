"""Native LAPJV solver vs scipy, plus the pure_callback matcher path."""
from __future__ import annotations

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from automoe_tpu.ops.lapjv_native import lapjv, lapjv_batch


def _optimal_cost(cost, rows, cols):
    return cost[rows, cols].sum()


def test_lapjv_matches_scipy_square(rng):
    for n in (1, 2, 5, 17, 64):
        cost = rng.normal(size=(n, n)).astype(np.float32)
        cols = lapjv(cost)
        assert sorted(cols) == list(range(n)) if n == len(set(cols)) else True
        ri, ci = linear_sum_assignment(cost.astype(np.float64))
        ours = _optimal_cost(cost, np.arange(n), cols)
        ref = _optimal_cost(cost, ri, ci)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_lapjv_rectangular(rng):
    for n, m in ((3, 8), (5, 5), (10, 40), (1, 100)):
        cost = rng.normal(size=(n, m)).astype(np.float32)
        cols = lapjv(cost)
        assert len(set(cols.tolist())) == n  # distinct columns
        ri, ci = linear_sum_assignment(cost.astype(np.float64))
        np.testing.assert_allclose(
            _optimal_cost(cost, np.arange(n), cols),
            _optimal_cost(cost, ri, ci),
            rtol=1e-5, atol=1e-5,
        )


def test_lapjv_batch_threaded(rng):
    B, n, m = 32, 12, 30
    costs = rng.normal(size=(B, n, m)).astype(np.float32)
    n_valid = rng.integers(0, n + 1, B).astype(np.int32)
    out = lapjv_batch(costs, n_valid, n_threads=4)
    for b in range(B):
        nv = int(n_valid[b])
        assert (out[b, nv:] == -1).all()
        if nv == 0:
            continue
        real = costs[b, :nv]
        ri, ci = linear_sum_assignment(real.astype(np.float64))
        np.testing.assert_allclose(
            real[np.arange(nv), out[b, :nv]].sum(),
            real[ri, ci].sum(),
            rtol=1e-5, atol=1e-5,
        )


def test_callback_matcher_agrees_with_device_matcher(rng):
    import jax.numpy as jnp

    from automoe_tpu.ops.lapjv_native import hungarian_match_callback
    from automoe_tpu.ops.matching import hungarian_match, match_cost_matrix

    B, Q, C, N = 3, 12, 10, 6
    logits = jnp.asarray(rng.normal(size=(B, Q, C)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.1, 0.9, (B, Q, 4)).astype(np.float32))
    tb = jnp.asarray(rng.uniform(0.1, 0.9, (B, N, 4)).astype(np.float32))
    tl = np.full((B, N), -1, np.int32)
    for b, n in enumerate([6, 0, 3]):
        tl[b, :n] = rng.integers(0, C, n)
    tl = jnp.asarray(tl)

    qi_dev, valid_dev = hungarian_match(logits, boxes, tb, tl)
    qi_cb, valid_cb = hungarian_match_callback(logits, boxes, tb, tl)
    np.testing.assert_array_equal(np.asarray(valid_dev), np.asarray(valid_cb))
    # assignments may differ at ties; compare realized cost
    for b in range(B):
        n = int(np.asarray(valid_dev)[b].sum())
        if n == 0:
            continue
        cost = np.asarray(
            match_cost_matrix(logits[b], boxes[b], tb[b], tl[b])
        )[:, :n]
        c_dev = cost[np.asarray(qi_dev)[b, :n], np.arange(n)].sum()
        c_cb = cost[np.asarray(qi_cb)[b, :n], np.arange(n)].sum()
        np.testing.assert_allclose(c_dev, c_cb, rtol=1e-4)


def test_batch_invalid_and_nan_rejected(rng):
    """Review r2: an invalid n_valid used to abort the worker's whole
    stripe (silently zeroing later samples) and NaN costs hung the
    augmenting loop forever — both now fail loudly; valid samples in the
    same batch still solve."""
    from automoe_tpu.ops.lapjv_native import lapjv_batch

    costs = rng.uniform(0, 1, (4, 5, 6)).astype(np.float32)
    # nv > n_rows for one sample
    with pytest.raises(ValueError, match="rc="):
        lapjv_batch(costs, n_valid=np.asarray([5, 9, 5, 5], np.int32))
    # NaN in one sample
    bad = costs.copy()
    bad[1, 2, 3] = np.nan
    with pytest.raises(ValueError, match="rc="):
        lapjv_batch(bad, n_valid=np.asarray([5, 5, 5, 5], np.int32))
