"""Flagship GATING train-step budget (the T7 pipeline the MoE exists for).

The detection budget (train_stage_bench.py) explained the expert step;
this bench does the same incremental-program-differencing for the full
AutoMoE gating step (4 frozen expert trunks + trainable gating/
extractors/context/policy — /root/reference/training/train_gating_network.py:76-105).

The interesting TPU-native question it answers: does XLA DCE the FROZEN
experts' backward? Our freeze is an optax `multi_transform` whose
'freeze' branch is `set_to_zero()` — the expert grads are *computed* by
`value_and_grad` but never *read*, so the compiler may (or may not)
delete the 4 conv-stack backwards. Torch freezing (`requires_grad=False`,
automoe.py:269-273) never builds them. Variants:

  v_fwd        eval-mode AutoMoE forward
  v_loss       loss_fn train=True (forward + gating losses + BN stats)
  v_frozen     production step, masked optimizer (DCE decides)
  v_stopgrad   production step + explicit stop_gradient on frozen params
               (forces the cut at the param boundary)
  v_unfrozen   all-params AdamW step (upper bound: full backward)
  v_cached     frozen-expert feature-cache step (train/feature_cache.py):
               expert trunks replaced by their precomputed pooled
               outputs — the floor for the trainable-parts step

If v_frozen ≈ v_stopgrad << v_unfrozen, XLA's DCE already gives the
torch freeze semantics for free. If v_frozen ≈ v_unfrozen, the masked
optimizer is NOT enough and stop_gradient must enter the production path.

Usage: python benchmarks/gating_train_bench.py [--batch 32] [--image 256]
Writes one JSON line; record results in benchmarks/BENCHMARKS.md.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.utils import enable_compile_cache
from benchmarks.train_stage_bench import timed_scan


def make_cached_step_measurer(batch=32, image=256, dtype="float32",
                              k_lo=2, k_hi=12, reps=4):
    """Reusable measurer for the frozen-expert FEATURE-CACHE gating
    train-step device time — the flagship T7 production configuration
    (`--cache-expert-features`). Builds the workload/state/jitted chain
    ONCE and returns a zero-arg callable -> step ms, so the interleaved-
    bound protocol (sustained_epoch_bench --interleave-bounds) can
    re-measure the bound between epochs without retracing. Methodology:
    serialized scan chain, two-K differencing, per-step pooled-input
    nudge so nothing hoists (timed_scan docstring)."""
    from automoe_tpu.configs import default_model_config
    from automoe_tpu.models.automoe import (
        automoe_pooled_features,
        expert_param_mask,
    )
    from automoe_tpu.train.feature_cache import pooled_keys
    from automoe_tpu.train.state import TrainState, make_optimizer
    from automoe_tpu.train.step import _train_body
    from automoe_tpu.train.workloads import gating_workload

    B, S = batch, image
    wl = gating_workload(default_model_config(), image_size=S,
                         dtype=jnp.dtype(dtype))
    wl_c = gating_workload(default_model_config(), image_size=S,
                           dtype=jnp.dtype(dtype), cache_features=True)
    model = wl.model
    horizon = wl.example_batch["waypoints"].shape[1]
    rng = np.random.default_rng(0)
    batch_d = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "lidar": jnp.asarray(rng.normal(size=(B, 1000, 3)).astype(np.float32)),
        "speed": jnp.asarray(rng.uniform(0, 10, (B, horizon)).astype(np.float32)),
        "steering": jnp.asarray(rng.normal(size=(B, horizon)).astype(np.float32)),
        "throttle": jnp.asarray(rng.uniform(0, 1, (B, horizon)).astype(np.float32)),
        "brake": jnp.asarray(np.zeros((B, horizon), np.float32)),
        "waypoints": jnp.asarray(rng.normal(size=(B, horizon, 2)).astype(np.float32)),
    }
    variables = wl.init_variables(jax.random.key(0))
    pooled = jax.jit(
        lambda v, b: automoe_pooled_features(model, v, b)
    )(variables, {"image": batch_d["image"], "lidar": batch_d["lidar"]})
    pnames = pooled_keys(len(model.config.experts))
    batch_cached = dict(batch_d, **dict(zip(pnames, pooled)))
    mask = expert_param_mask(jax.device_get(variables["params"]), frozen=True)
    tx = make_optimizer(learning_rate=4e-4, weight_decay=1e-4,
                        total_steps=1000, trainable_mask=mask)
    state = TrainState.create(
        params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )

    def v_cached(state, b, k):
        b = dict(b)
        for name in pnames:
            b[name] = b[name] + state.step.astype(jnp.float32) * 1e-6
        new_state, _ = _train_body(wl_c.loss_fn, state, b, k)
        return new_state

    from benchmarks.train_stage_bench import make_timed_scan

    return make_timed_scan(v_cached, state, batch_cached,
                           jax.random.key(1), k_lo=k_lo, k_hi=k_hi,
                           reps=reps)


def measure_cached_step_ms(batch=32, image=256, dtype="float32", k_hi=12):
    """One-shot cached-gating step time (ms) — bench.py's regression
    hook (VERDICT r3 item 7)."""
    return make_cached_step_measurer(
        batch=batch, image=image, dtype=dtype, k_hi=k_hi
    )()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image", type=int, default=256)
    p.add_argument("--k-hi", type=int, default=12)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--only", default=None,
                   help="comma-separated variant names to run")
    p.add_argument("--cpu", action="store_true",
                   help="smoke-test on CPU (the JAX_PLATFORMS env is "
                   "ignored by this platform plugin — CLAUDE.md landmine 3)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    from automoe_tpu.configs import default_model_config
    from automoe_tpu.models.automoe import expert_param_mask
    from automoe_tpu.train.state import TrainState, make_optimizer
    from automoe_tpu.train.step import _train_body
    from automoe_tpu.train.workloads import gating_workload

    B, S = args.batch, args.image
    wl = gating_workload(default_model_config(), image_size=S,
                         dtype=jnp.dtype(args.dtype))
    model = wl.model
    horizon = wl.example_batch["waypoints"].shape[1]

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "lidar": jnp.asarray(rng.normal(size=(B, 1000, 3)).astype(np.float32)),
        "speed": jnp.asarray(rng.uniform(0, 10, (B, horizon)).astype(np.float32)),
        "steering": jnp.asarray(rng.normal(size=(B, horizon)).astype(np.float32)),
        "throttle": jnp.asarray(rng.uniform(0, 1, (B, horizon)).astype(np.float32)),
        "brake": jnp.asarray(np.zeros((B, horizon), np.float32)),
        "waypoints": jnp.asarray(rng.normal(size=(B, horizon, 2)).astype(np.float32)),
    }
    variables = wl.init_variables(jax.random.key(0))
    params_np = jax.device_get(variables["params"])
    stats_np = jax.device_get(variables.get("batch_stats", {}))
    key = jax.random.key(1)

    mask = expert_param_mask(params_np, frozen=True)
    tx_frozen = make_optimizer(
        learning_rate=4e-4, weight_decay=1e-4, total_steps=1000,
        trainable_mask=mask,
    )
    tx_all = make_optimizer(
        learning_rate=4e-4, weight_decay=1e-4, total_steps=1000
    )

    def fresh_state(tx):
        return TrainState.create(
            params=jax.tree.map(jnp.asarray, params_np), tx=tx,
            batch_stats=jax.tree.map(jnp.asarray, stats_np),
        )

    eps = jnp.float32(1e-12)

    # Every variant sees a per-iteration-DIFFERENT batch (image nudged by
    # state.step). Without this, a same-batch scan chain lets XLA hoist
    # the frozen experts' forward out of the loop entirely (their params
    # provably don't change once set_to_zero's add-0 simplifies), and
    # v_frozen "measures" 6.3 ms — faster than the forward-only chain.
    # Real training feeds a new batch each step; the nudge (one 25 MB
    # elementwise add, ~0.06 ms at HBM rate) restores that regime.
    def perturb(b, state):
        return dict(b, image=b["image"] + state.step.astype(jnp.float32) * 1e-6)

    def v_fwd(state, b, k):
        b = perturb(b, state)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b, train=False,
        )
        s = jnp.mean(out["waypoints"].astype(jnp.float32))
        new_params = jax.tree.map(
            lambda p_: p_ + (eps * s).astype(p_.dtype), state.params
        )
        return state.replace(step=state.step + 1, params=new_params)

    def v_loss(state, b, k):
        b = perturb(b, state)
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

    def v_frozen(state, b, k):
        new_state, _ = _train_body(wl.loss_fn, state, perturb(b, state), k)
        return new_state

    def stopgrad_loss(params, batch_stats, b, k, train):
        cut = jax.tree.map(
            lambda p_, m: p_ if m else jax.lax.stop_gradient(p_), params, mask
        )
        return wl.loss_fn(cut, batch_stats, b, k, train)

    def v_stopgrad(state, b, k):
        new_state, _ = _train_body(stopgrad_loss, state, perturb(b, state), k)
        return new_state

    def v_unfrozen(state, b, k):
        new_state, _ = _train_body(wl.loss_fn, state, perturb(b, state), k)
        return new_state

    # feature-cache step: pooled expert features precomputed once, the
    # trunks never run. Nudge the POOLED inputs per step (the image is
    # dead in this graph) so the trainable forward can't hoist.
    from automoe_tpu.models.automoe import automoe_pooled_features
    from automoe_tpu.train.feature_cache import pooled_keys

    wl_c = gating_workload(default_model_config(), image_size=S,
                           dtype=jnp.dtype(args.dtype), cache_features=True)
    pooled = jax.jit(
        lambda v, b: automoe_pooled_features(model, v, b)
    )(variables, {"image": batch["image"], "lidar": batch["lidar"]})
    pnames = pooled_keys(len(model.config.experts))
    batch_cached = dict(batch, **dict(zip(pnames, pooled)))

    def v_cached(state, b, k):
        b = dict(b)
        for name in pnames:
            b[name] = b[name] + state.step.astype(jnp.float32) * 1e-6
        new_state, _ = _train_body(wl_c.loss_fn, state, b, k)
        return new_state

    results = {}
    only = set(args.only.split(",")) if args.only else None
    for name, fn, tx in [
        ("v_fwd", v_fwd, tx_frozen),
        ("v_loss", v_loss, tx_frozen),
        ("v_frozen", v_frozen, tx_frozen),
        ("v_stopgrad", v_stopgrad, tx_frozen),
        ("v_unfrozen", v_unfrozen, tx_all),
        ("v_cached", v_cached, tx_frozen),
    ]:
        if only is not None and name not in only:
            continue
        b = batch_cached if name == "v_cached" else batch
        results[name] = timed_scan(fn, fresh_state(tx), b, key,
                                   k_hi=args.k_hi)
        print(f"[gtb] {name}: {results[name]:.3f} ms", file=sys.stderr,
              flush=True)

    out = {
        "metric": "gating_train_step_budget",
        "batch": B, "image": S, "dtype": args.dtype,
        "stages_ms": {k: round(v, 3) for k, v in results.items()},
    }
    if "v_frozen" in results:
        out["samples_per_sec"] = round(B / results["v_frozen"] * 1e3, 1)
    if {"v_frozen", "v_stopgrad", "v_unfrozen"} <= results.keys():
        out["xla_dce_frozen_bwd"] = bool(
            results["v_frozen"] < 0.5 * (results["v_stopgrad"]
                                         + results["v_unfrozen"])
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
