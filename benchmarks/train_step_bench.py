"""Training-step throughput benchmark (secondary to bench.py).

Measures the jitted detection train step (fwd+bwd+AdamW, on-device
matching) at B=32/256x256/cap48 with each matcher, using dependent python
stepping (state donation serializes the chain) and a final host fetch.

Usage: python benchmarks/train_step_bench.py [--matcher auction|hungarian]
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

from automoe_tpu.train import TrainState, make_optimizer, make_train_step
from automoe_tpu.train.workloads import bdd_expert_workload
from automoe_tpu.utils import enable_compile_cache


def run(matcher: str, batch_size: int = 32, image_size: int = 256,
        dtype=jnp.float32):
    rng = np.random.default_rng(0)
    cap = 48
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(batch_size, image_size, image_size, 3)).astype(np.float32)
        ),
        "bboxes": jnp.asarray(
            rng.uniform(0.1, 0.9, (batch_size, cap, 4)).astype(np.float32)
        ),
        "labels": jnp.asarray(
            np.where(np.arange(cap)[None, :] < 12,
                     rng.integers(0, 10, (batch_size, cap)), -1).astype(np.int32)
        ),
    }
    wl = bdd_expert_workload(
        "detection", image_size=image_size, box_cap=cap, matcher=matcher,
        dtype=dtype,
    )
    variables = wl.init_variables(jax.random.key(0))
    tx = make_optimizer(learning_rate=2e-4, weight_decay=1e-4, total_steps=1000)
    step = make_train_step(wl.loss_fn)

    def chain(K):
        state = TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]), tx=tx,
            batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        )
        t0 = time.perf_counter()
        m = None
        for _ in range(K):
            state, m = step(state, batch, jax.random.key(1))
        float(np.asarray(m["loss"]))  # force completion
        return time.perf_counter() - t0

    chain(2)  # compile
    t_lo = min(chain(4) for _ in range(3))
    t_hi = min(chain(16) for _ in range(3))
    per = (t_hi - t_lo) / 12
    return {
        "matcher": matcher,
        "dtype": jnp.dtype(dtype).name,
        "step_ms": round(per * 1e3, 2),
        "samples_per_sec": round(batch_size / per, 1),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--matcher", default="auction_pallas",
                   choices=["auction", "hungarian", "auction_pallas", "both"])
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bf16", "both"],
                   help="compute dtype (params/optimizer stay fp32 — the "
                        "reference's AMP regime, train_bdd100k_ddp.py)")
    args = p.parse_args()
    enable_compile_cache()
    matchers = (
        ["auction_pallas", "auction", "hungarian"]
        if args.matcher == "both"
        else [args.matcher]
    )
    dtypes = {
        "fp32": [jnp.float32], "bf16": [jnp.bfloat16],
        "both": [jnp.float32, jnp.bfloat16],
    }[args.dtype]
    for m in matchers:
        for dt in dtypes:
            print(json.dumps(run(m, dtype=dt)))
