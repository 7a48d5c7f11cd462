"""Detection TRAIN-step component budget (VERDICT r2 next #3).

The r2 ledger records a ~16 ms B=32/256² detection train step against a
~1.2 ms single-expert forward conv cost — a ~4x fwd+bwd gap with no
breakdown. Two measurement regimes were tried and rejected first (their
artifacts are worth recording):

  * lax.scan chains of isolated stage bodies reduce only part of the
    carry — XLA DCE'd the whole optimizer stage (0.23 ms "full step");
  * donated python dependent-stepping (train_step_bench's regime) hits
    this tunnel's per-dispatch RPC floor (~10-12 ms): a bare eval
    forward "measured" 11.8 ms and stages summed to 2-3x the step.

What this bench does instead: INCREMENTAL PROGRAM DIFFERENCING inside
the production fast path. Four step variants — fwd-only, +matcher/loss,
+backward, +optimizer — each run as a `lax.scan` over the real
TrainState carry (exactly `steps_per_call` training, CLAUDE.md landmine
8 regime), with the fetched scalar reducing EVERY state leaf so nothing
DCEs. Differencing consecutive variants yields per-stage device time
with dispatch cost cancelled:

  fwd        = t(V_fwd)
  match_loss = t(V_loss) - t(V_fwd)    matcher + scatter + CE/L1 + BN
  bwd        = t(V_grad) - t(V_loss)
  optimizer  = t(V_full) - t(V_grad)   clip + AdamW + schedule

Also reported standalone (scan-chained): the matcher alone and the
scatter+loss assembly alone, for cross-checking match_loss.

Usage: python benchmarks/train_stage_bench.py [--batch 32] [--image 256]
       [--matcher auction_pallas] [--dtype float32]
Writes one JSON line; record results in benchmarks/BENCHMARKS.md.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.utils import enable_compile_cache


def make_timed_scan(step_fn, c0, *aux, k_lo=2, k_hi=12, reps=4):
    """Build a reusable measurer for the per-iteration time of `step_fn`
    (carry, *aux) -> carry: scanned K times with the FULL carry reduced
    into the fetched scalar (no DCE) and differenced over two K's
    (dispatch/fetch cost cancels). The carry is NOT donated, so one
    device-resident c0 serves every run — re-uploading a 135 MB
    TrainState per rep over this tunnel (~50 MB/s) buried the signal in
    upload-scheduling noise.

    Returns a zero-arg callable -> slope ms. The jitted chain is built
    ONCE and closed over, so repeated calls (the interleaved-bound
    protocol re-measures the bound between training epochs in the same
    process) cost only the chain executions, no retrace/recompile."""

    @functools.partial(jax.jit, static_argnames="K")
    def chained(c, K, *aux):
        def body(c, _):
            return step_fn(c, *aux), ()

        out, _ = jax.lax.scan(body, c, None, length=K)
        return sum(
            jnp.sum(leaf.astype(jnp.float32).ravel()[:1])
            for leaf in jax.tree.leaves(out)
        )

    def run(K):
        np.asarray(chained(c0, K, *aux))  # compile / warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(c0, K, *aux))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def measure():
        slope = (run(k_hi) - run(k_lo)) / (k_hi - k_lo) * 1e3
        if slope <= 0:
            # sub-noise stage (can happen for ~0-cost bodies on CPU smoke
            # runs); report 0 rather than abort the whole budget
            print(f"[tsb] WARNING: non-positive slope {slope:.4f} ms -> 0",
                  file=sys.stderr, flush=True)
            return 0.0
        return slope

    return measure


def timed_scan(step_fn, c0, *aux, k_lo=2, k_hi=12, reps=4):
    """One-shot `make_timed_scan` (the original API)."""
    return make_timed_scan(
        step_fn, c0, *aux, k_lo=k_lo, k_hi=k_hi, reps=reps
    )()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image", type=int, default=256)
    p.add_argument("--matcher", default=None)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--box-cap", type=int, default=48)
    p.add_argument(
        "--matcher-iters", type=int, default=None,
        help="override auction_match_pallas max_iters (before/after "
        "measurement of the iteration cap)",
    )
    args = p.parse_args()
    enable_compile_cache()

    if args.matcher_iters is not None:
        import automoe_tpu.ops.pallas_auction as _pa

        _pa.auction_match_pallas = functools.partial(
            _pa.auction_match_pallas, max_iters=args.matcher_iters
        )

    from automoe_tpu.losses.detection import (
        _get_matcher,
        scatter_matched_targets,
    )
    from automoe_tpu.ops.boxes import box_convert
    from automoe_tpu.ops.masked import masked_cross_entropy, masked_smooth_l1
    from automoe_tpu.train.state import TrainState, make_optimizer
    from automoe_tpu.train.step import _train_body
    from automoe_tpu.train.workloads import bdd_expert_workload, default_matcher

    B, S, N = args.batch, args.image, args.box_cap
    dtype = jnp.dtype(args.dtype)
    matcher = args.matcher or default_matcher()
    C = 10
    wl = bdd_expert_workload(
        "detection", image_size=S, box_cap=N, matcher=matcher, dtype=dtype
    )
    model = wl.model
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32))
    xy1 = rng.uniform(0.05, 0.45, (B, N, 2))
    xy2 = rng.uniform(0.55, 0.95, (B, N, 2))
    boxes = jnp.asarray(np.concatenate([xy1, xy2], -1).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, (B, N)).astype(np.int32))
    batch = {"image": img, "bboxes": boxes, "labels": labels}
    variables = wl.init_variables(jax.random.key(0))
    params_np = jax.device_get(variables["params"])
    stats_np = jax.device_get(variables.get("batch_stats", {}))
    key = jax.random.key(1)
    tx = make_optimizer(
        learning_rate=1e-4, weight_decay=1e-4, total_steps=1000
    )

    state0 = TrainState.create(
        params=jax.tree.map(jnp.asarray, params_np), tx=tx,
        batch_stats=jax.tree.map(jnp.asarray, stats_np),
    )

    eps = jnp.float32(1e-12)

    # V_fwd: eval-mode forward only; params nudged by the output so the
    # scan carry depends on the whole computation
    def v_fwd(state, b, k):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b["image"],
        )
        s = (jnp.mean(out["class_logits"].astype(jnp.float32))
             + jnp.mean(out["bbox_deltas"].astype(jnp.float32)))
        new_params = jax.tree.map(
            lambda p_: p_ + (eps * s).astype(p_.dtype), state.params
        )
        return state.replace(step=state.step + 1, params=new_params)

    # V_loss: the real loss_fn (train=True: matcher + scatter + CE/L1 +
    # BN batch stats), no backward
    def v_loss(state, b, k):
        k = jax.random.fold_in(k, state.step)
        loss, (_, new_stats) = wl.loss_fn(
            state.params, state.batch_stats, b, k, True
        )
        new_params = jax.tree.map(
            lambda p_: p_ + (eps * loss).astype(p_.dtype), state.params
        )
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats
        )

    # V_grad: value_and_grad, raw SGD-eps update (no clip/AdamW)
    def v_grad(state, b, k):
        k = jax.random.fold_in(k, state.step)

        def f(p_):
            return wl.loss_fn(p_, state.batch_stats, b, k, True)

        (_, (_, new_stats)), grads = jax.value_and_grad(f, has_aux=True)(
            state.params
        )
        new_params = jax.tree.map(
            lambda p_, g: p_ - (eps * g.astype(jnp.float32)).astype(p_.dtype),
            state.params, grads,
        )
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats
        )

    # V_full: the production body (grad + clip + AdamW + stats)
    def v_full(state, b, k):
        new_state, _ = _train_body(wl.loss_fn, state, b, k)
        return new_state

    results = {}
    for name, fn in [("v_fwd", v_fwd), ("v_loss", v_loss),
                     ("v_grad", v_grad), ("v_full", v_full)]:
        results[name] = timed_scan(fn, state0, batch, key)
        print(f"[tsb] {name}: {results[name]:.3f} ms", file=sys.stderr,
              flush=True)

    # standalone cross-checks (image-shaped carries, same scan regime)
    Q = (S // 32) ** 2
    logits_np = rng.normal(size=(B, Q, C)).astype(np.float32)
    pboxes = jnp.asarray(rng.uniform(0.0, 1.0, (B, Q, 4)).astype(np.float32))
    tgt_cxcywh = box_convert(boxes, "xyxy", "cxcywh")
    match_fn = _get_matcher(matcher)

    def match_body(c, pb, tg, lb):
        qidx, valid = match_fn(c, pb, tg, lb)
        return c + jnp.sum(qidx).astype(c.dtype) * 1e-12

    results["matcher_alone"] = timed_scan(
        match_body, jnp.asarray(logits_np), pboxes, tgt_cxcywh, labels,
    )
    qidx0, valid0 = jax.jit(match_fn)(
        jnp.asarray(logits_np), pboxes, tgt_cxcywh, labels
    )

    def scatter_body(c, pb, qi, va, tg, lb):
        tc, tb = scatter_matched_targets(qi, va, tg, lb, Q, C)
        cl = masked_cross_entropy(
            c.reshape(B * Q, C), tc.reshape(B * Q), ignore_index=C
        )
        matched = tc.reshape(B * Q) != C
        bl = masked_smooth_l1(
            pb.reshape(B * Q, 4), tb.reshape(B * Q, 4), matched
        )
        return c + (cl + bl).astype(c.dtype) * 1e-7

    results["scatter_loss_alone"] = timed_scan(
        scatter_body, jnp.asarray(logits_np), pboxes, qidx0, valid0,
        tgt_cxcywh, labels,
    )

    derived = {
        "fwd": results["v_fwd"],
        "match_loss": results["v_loss"] - results["v_fwd"],
        "bwd": results["v_grad"] - results["v_loss"],
        "optimizer": results["v_full"] - results["v_grad"],
    }
    print(json.dumps({
        "metric": "detection_train_step_budget",
        "batch": B, "image": S, "matcher": matcher, "dtype": args.dtype,
        "stages_ms": {k: round(v, 3) for k, v in results.items()},
        "derived_ms": {k: round(v, 3) for k, v in derived.items()},
        "samples_per_sec": round(B / results["v_full"] * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
