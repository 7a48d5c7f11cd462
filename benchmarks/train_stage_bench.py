"""Detection TRAIN-step component budget (VERDICT r2 next #3).

The r2 ledger records a 16.2 ms B=32/256² detection train step against a
~1.2 ms single-expert forward conv cost — a ~4x fwd+bwd gap with no
breakdown. This bench measures each stage with the SAME regime as the
16.2 ms number being explained: donated jitted bodies chained by python
dependent stepping (train_step_bench.py), differencing two chain lengths
so dispatch/fetch overhead cancels. (A first version used lax.scan
chains; scan double-buffers the big carry, inflating state-carrying
stages ~2x, and reducing only the first state leaf let XLA DCE the whole
optimizer — both artifacts are gone with the python chain.)

  stages_ms:
    fwd_conv        expert forward only (eval mode)
    fwd_loss        loss_fn(train=True): fwd + matcher + scatter + CE/L1
    matcher         the assignment alone (default TPU matcher)
    scatter_loss    target scatter + masked CE + SmoothL1, match given
    grad            value_and_grad of loss_fn (fwd + bwd)
    full_step       the jitted optimizer step (grad + clip + AdamW)

  derived_ms:
    bwd       = grad - fwd_loss
    optimizer = full_step - grad
    match_overhead_in_fwd = fwd_loss - fwd_conv_train_estimate

Usage: python benchmarks/train_stage_bench.py [--batch 32] [--image 256]
       [--matcher auction_pallas] [--dtype float32]
Writes one JSON line; record results in benchmarks/BENCHMARKS.md.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.utils import enable_compile_cache


def timed_pychain(body, make_c0, *aux, k_lo=4, k_hi=16, reps=3):
    """Per-iteration device time of `body` (carry, *aux) -> carry.

    The carry pytree is DONATED, each python dispatch depends on the
    previous one's full output state (nothing hoists, buffers update in
    place — exactly the production Trainer regime), and the chain ends in
    a real host fetch (block_until_ready acks early on this runtime).
    make_c0 must build a fresh carry per run: donation consumes buffers.
    """
    step = jax.jit(body, donate_argnums=0)

    def run(K):
        c = make_c0()
        t0 = time.perf_counter()
        for _ in range(K):
            c = step(c, *aux)
        np.asarray(jax.tree.leaves(c)[0])  # host fetch forces completion
        return time.perf_counter() - t0

    run(2)  # compile
    t_lo = min(run(k_lo) for _ in range(reps))
    t_hi = min(run(k_hi) for _ in range(reps))
    slope = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
    if slope <= 0:
        raise RuntimeError(f"non-positive chain slope {slope:.4f} ms")
    return slope


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image", type=int, default=256)
    p.add_argument("--matcher", default=None)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--box-cap", type=int, default=48)
    args = p.parse_args()
    enable_compile_cache()

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
    img_np = rng.normal(size=(B, S, S, 3)).astype(np.float32)
    img = jnp.asarray(img_np)
    xy1 = rng.uniform(0.05, 0.45, (B, N, 2))
    xy2 = rng.uniform(0.55, 0.95, (B, N, 2))
    boxes = jnp.asarray(np.concatenate([xy1, xy2], -1).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, (B, N)).astype(np.int32))
    variables = wl.init_variables(jax.random.key(0))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    params_np = jax.device_get(params)  # fresh donated carries per run
    stats_np = jax.device_get(stats)
    key = jax.random.key(1)
    results = {}
    fresh_img = lambda: jnp.asarray(img_np)

    # All device values cross the jit boundary as ARGUMENTS — closed-over
    # device arrays are the dispatch-poison landmine (CLAUDE.md rule 1).

    # 1. pure conv forward (eval mode — no BN stat update)
    def fwd_conv(c, p, st):
        out = model.apply({"params": p, "batch_stats": st}, c)
        return c + jnp.mean(out["class_logits"]).astype(c.dtype) * 1e-7

    results["fwd_conv"] = timed_pychain(fwd_conv, fresh_img, params, stats)

    # 2. loss_fn train=True (fwd + matcher + scatter + losses + BN stats)
    def fwd_loss(c, p, st, bx, lb, k):
        loss, _ = wl.loss_fn(
            p, st, {"image": c, "bboxes": bx, "labels": lb}, k, True,
        )
        return c + loss.astype(c.dtype) * 1e-7

    results["fwd_loss"] = timed_pychain(
        fwd_loss, fresh_img, params, stats, boxes, labels, key
    )

    # 3. matcher alone on representative predictions
    Q = (S // 32) ** 2
    logits_np = rng.normal(size=(B, Q, C)).astype(np.float32)
    logits0 = jnp.asarray(logits_np)
    fresh_logits = lambda: jnp.asarray(logits_np)
    pboxes = jnp.asarray(rng.uniform(0.0, 1.0, (B, Q, 4)).astype(np.float32))
    tgt_cxcywh = box_convert(boxes, "xyxy", "cxcywh")
    match_fn = _get_matcher(matcher)

    def match_body(c, pb, tg, lb):
        qidx, valid = match_fn(c, pb, tg, lb)
        return c + jnp.sum(qidx).astype(c.dtype) * 1e-12

    results["matcher"] = timed_pychain(
        match_body, fresh_logits, pboxes, tgt_cxcywh, labels
    )

    # 4. scatter + masked CE/L1 with the match given
    qidx0, valid0 = jax.jit(match_fn)(logits0, pboxes, tgt_cxcywh, labels)

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

    results["scatter_loss"] = timed_pychain(
        scatter_body, fresh_logits, pboxes, qidx0, valid0, tgt_cxcywh, labels
    )

    # 5. fwd + bwd (no optimizer)
    def grad_body(c, st, im, bx, lb, k):
        def f(p):
            loss, _ = wl.loss_fn(
                p, st, {"image": im, "bboxes": bx, "labels": lb}, k, True,
            )
            return loss

        grads = jax.grad(f)(c)
        return jax.tree.map(lambda p, g: p - 1e-12 * g, c, grads)

    fresh_params = lambda: jax.tree.map(jnp.asarray, params_np)
    results["grad"] = timed_pychain(
        grad_body, fresh_params, stats, img, boxes, labels, key
    )

    # 6. the real jitted optimizer step
    tx = make_optimizer(
        learning_rate=1e-4, weight_decay=1e-4, total_steps=1000
    )

    def fresh_state():
        return TrainState.create(
            params=jax.tree.map(jnp.asarray, params_np), tx=tx,
            batch_stats=jax.tree.map(jnp.asarray, stats_np),
        )

    def step_body(st, im, bx, lb, k):
        new_state, _ = _train_body(
            wl.loss_fn, st, {"image": im, "bboxes": bx, "labels": lb}, k,
        )
        return new_state

    results["full_step"] = timed_pychain(
        step_body, fresh_state, img, boxes, labels, key
    )

    derived = {
        "bwd": results["grad"] - results["fwd_loss"],
        "optimizer": results["full_step"] - results["grad"],
        "match_plus_scatter": results["matcher"] + results["scatter_loss"],
    }
    print(json.dumps({
        "metric": "detection_train_step_budget",
        "batch": B, "image": S, "matcher": matcher, "dtype": args.dtype,
        "stages_ms": {k: round(v, 3) for k, v in results.items()},
        "derived_ms": {k: round(v, 3) for k, v in derived.items()},
        "samples_per_sec": round(B / results["full_step"] * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
