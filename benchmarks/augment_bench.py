"""On-device augmentation cost (ops/augment.py; north-star data plane).

Measures the fused crop+flip+color augmentation alone and the
detection train step with/without augmentation at the headline batch,
via the serialized-chain differencing methodology (train_stage_bench).
The claim to check: augmentation is VPU/bandwidth work that overlaps
into the step's HLO for a few percent of step time — not a host-side
data-pipeline stage.

Usage: python benchmarks/augment_bench.py [--batch 128] [--image 256]
       [--cpu]
Run in BACKGROUND with a generous window; never kill mid-compile
(CLAUDE.md landmine 4).
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image", type=int, default=256)
    p.add_argument("--box-cap", type=int, default=48)
    p.add_argument("--train-batch", type=int, default=32,
                   help="batch for the with/without train-step cells")
    p.add_argument("--k-hi", type=int, default=12)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.watchdog import init_watchdog

    dev = init_watchdog()[0]
    from automoe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from automoe_tpu.ops.augment import augment_detection
    from benchmarks.train_stage_bench import timed_scan

    B, S, cap = args.batch, args.image, args.box_cap
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(B, S, S, 3)).astype(np.float32)
        ),
        "bboxes": jnp.asarray(
            rng.uniform(0, S, (B, cap, 4)).astype(np.float32)
        ),
        "labels": jnp.asarray(
            rng.integers(-1, 10, (B, cap)).astype(np.int32)
        ),
    }

    # augment-only: carry = (raw key data, image sum) so each iteration
    # re-keys. The carry holds jax.random.key_data (uint32), not a typed
    # key: timed_scan force-fetches the carry by summing every leaf as
    # float32, and typed key arrays refuse that cast.
    def v_aug(carry, b):
        kd, acc = carry
        key = jax.random.fold_in(jax.random.wrap_key_data(kd), 0)
        out = augment_detection(dict(b, image=b["image"] + acc * 1e-12), key)
        return (jax.random.key_data(key),
                acc + jnp.mean(out["image"].astype(jnp.float32)))

    ms_aug = timed_scan(
        v_aug, (jax.random.key_data(jax.random.key(0)), jnp.float32(0.0)),
        batch, k_hi=args.k_hi)
    out = {
        "metric": "augment_ms",
        "batch": B, "image": S, "device": str(dev),
        "augment_only_ms": round(ms_aug, 3),
        "augment_fps": round(B / ms_aug * 1e3, 1) if ms_aug else None,
    }
    print(json.dumps({"augment_only": out}), flush=True)

    # train step with vs without augmentation (detection, production B)
    from automoe_tpu.train.state import TrainState, make_optimizer
    from automoe_tpu.train.step import _train_body
    from automoe_tpu.train.workloads import bdd_expert_workload

    Bt = args.train_batch
    tb = {
        "image": jnp.asarray(
            rng.normal(size=(Bt, S, S, 3)).astype(np.float32)
        ),
        "bboxes": jnp.asarray(
            rng.uniform(0.1 * S, 0.9 * S, (Bt, cap, 4)).astype(np.float32)
        ),
        "labels": jnp.asarray(np.where(
            np.arange(cap)[None, :] < 12,
            rng.integers(0, 10, (Bt, cap)), -1
        ).astype(np.int32)),
    }
    cells = {}
    for name, aug in (("plain", False), ("augment", True)):
        wl = bdd_expert_workload(
            "detection", image_size=S, box_cap=cap, augment=aug,
            matcher="auction_pallas" if not args.cpu else "auction",
        )
        variables = wl.init_variables(jax.random.key(0))
        tx = make_optimizer(learning_rate=2e-4, weight_decay=1e-4,
                            total_steps=1000)
        state = TrainState.create(
            params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )

        def step(st, b, k):
            b = dict(b, image=b["image"]
                     + st.step.astype(jnp.float32) * 1e-6)
            new_st, _ = _train_body(wl.loss_fn, st, b, k)
            return new_st

        cells[name] = timed_scan(step, state, tb, jax.random.key(1),
                                 k_hi=args.k_hi)
        print(json.dumps({f"train_step_{name}_ms": round(cells[name], 3)}),
              flush=True)
    out["train_step_plain_ms"] = round(cells["plain"], 3)
    out["train_step_augment_ms"] = round(cells["augment"], 3)
    if cells["plain"]:
        out["augment_step_overhead_pct"] = round(
            (cells["augment"] / cells["plain"] - 1.0) * 100.0, 1
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
