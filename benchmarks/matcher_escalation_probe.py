"""On-chip probe for the r4 exact-escalation auction matcher.

Validates, on the real TPU:
  1. the in-kernel Jonker-Volgenant escalation path (`_jv_exact`) lowers
     through Mosaic (no interpret mode);
  2. on-chip assignments are Hungarian-exact (cost-equal vs scipy f64) in
     BOTH the diverse regime and the degenerate near-tie regime that
     motivated the r3 cap;
  3. step time: escalate=True at cap 300 vs the r3 greedy policy
     (escalate=False) vs uncapped (max_iters=1000), in both regimes —
     the VERDICT r3 acceptance bar is "within ~5% of cap-300" in the
     degenerate regime.

Timing uses the serialized lax.scan chain-differencing methodology from
bench.py (carry→input data dependency; RPC overhead cancels in the
difference between two chain lengths).
"""
from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from automoe_tpu.ops.matching import match_cost_matrix
from automoe_tpu.ops.pallas_auction import auction_match_pallas
from automoe_tpu.utils import enable_compile_cache


def fixtures(B=32, Q=64, C=10, N=48, noise=1e-3, seed=4242):
    rng = np.random.default_rng(seed)
    # degenerate: every query near-identical (untrained BN detector)
    base_logit = rng.normal(size=(1, 1, C)).astype(np.float32)
    base_box = np.array([[0.4, 0.4, 0.6, 0.6]], np.float32)
    deg = dict(
        logits=base_logit + noise * rng.normal(size=(B, Q, C)).astype(np.float32),
        boxes=np.clip(
            base_box + noise * rng.normal(size=(B, Q, 4)).astype(np.float32), 0, 1
        ),
    )
    # diverse: spread predictions (a few epochs in)
    div = dict(
        logits=rng.normal(size=(B, Q, C)).astype(np.float32),
        boxes=rng.uniform(0.05, 0.95, (B, Q, 4)).astype(np.float32),
    )
    tb = rng.uniform(0.1, 0.9, (B, N, 4)).astype(np.float32)
    tl = rng.integers(0, C, (B, N)).astype(np.int32)
    return deg, div, tb, tl


def check_exact(name, logits, boxes, tb, tl, **kw):
    from scipy.optimize import linear_sum_assignment

    qi, valid = jax.jit(
        lambda l, b: auction_match_pallas(
            l, b, jnp.asarray(tb), jnp.asarray(tl), interpret=False, **kw
        )
    )(jnp.asarray(logits), jnp.asarray(boxes))
    qi, valid = np.asarray(qi), np.asarray(valid)
    B, N = qi.shape
    assert valid.all(), f"{name}: dropped targets"
    worst = 0.0
    for b in range(B):
        assert len(set(qi[b].tolist())) == N, f"{name}: duplicate assignment"
        cost = np.asarray(
            match_cost_matrix(
                jnp.asarray(logits[b]), jnp.asarray(boxes[b]),
                jnp.asarray(tb[b]), jnp.asarray(tl[b]),
            )
        ).astype(np.float64)
        ri, ci = linear_sum_assignment(cost)
        gap = cost[qi[b], np.arange(N)].sum() - cost[ri, ci].sum()
        worst = max(worst, gap)
    print(f"  {name}: exact on-chip, worst cost gap {worst:.3e}", flush=True)
    return worst


def chain_time_ms(logits, boxes, tb, tl, k_lo=4, k_hi=16, reps=4, **kw):
    """Per-call matcher time by scan differencing (carry perturbs logits).

    Targets are threaded as jit ARGUMENTS — closing a jitted fn over jnp
    device arrays poisons every later dispatch in the session to ~26 ms
    (CLAUDE.md landmine 1), which would skew every cell timed after the
    first in this very sweep."""

    @functools.partial(jax.jit, static_argnames="K")
    def chained(logits, boxes, tb_j, tl_j, K):
        def body(carry, _):
            l = logits + carry * 1e-7
            qi, valid = auction_match_pallas(
                l, boxes, tb_j, tl_j, interpret=False, **kw
            )
            return jnp.float32(jnp.sum(qi) % 97) * 1e-3, ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return out

    args = tuple(jnp.asarray(x) for x in (logits, boxes, tb, tl))

    def timed(K):
        np.asarray(chained(*args, K=K))  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(*args, K=K))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e3


def main():
    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    deg, div, tb, tl = fixtures()

    print("exactness (escalate=True, cap 300):", flush=True)
    g1 = check_exact("degenerate", deg["logits"], deg["boxes"], tb, tl)
    g2 = check_exact("diverse   ", div["logits"], div["boxes"], tb, tl)

    rows = {}
    for name, fx in (("degenerate", deg), ("diverse", div)):
        for label, kw in (
            ("escalate_cap300", dict(max_iters=300, escalate=True)),
            ("greedy_cap300_r3", dict(max_iters=300, escalate=False)),
            ("uncapped_1000", dict(max_iters=1000, escalate=False)),
        ):
            ms = chain_time_ms(fx["logits"], fx["boxes"], tb, tl, **kw)
            rows[f"{name}.{label}"] = round(ms, 3)
            print(f"  {name:10s} {label:16s}: {ms:7.3f} ms/call", flush=True)

    print(json.dumps({
        "probe": "matcher_escalation",
        "worst_gap_degenerate": float(g1),
        "worst_gap_diverse": float(g2),
        "times_ms": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
