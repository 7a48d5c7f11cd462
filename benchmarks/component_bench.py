"""Component-level device timing of the headline B=128 inference step.

Breaks bench.py's e2e program into stages (preprocess, each expert,
policy, full model) and times each with the serialized scan-chain
method, to locate where the 0.67-MFU step spends its time. The
extractors+gating stage is NOT timed standalone — it is the residual
full_model - parts_sum (it needs all four experts' features as input, and
measured end-to-end it is <2% of the step).

All device values cross the jit boundary as ARGUMENTS — closed-over
device arrays are the documented dispatch-poison landmine (CLAUDE.md
rule 1; bench.py threads its values the same way).

Usage: python benchmarks/component_bench.py [--batch 128]
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

from automoe_tpu.utils import enable_compile_cache, jit_init


def timed_chain(body, x0, *aux, k_lo=2, k_hi=10, reps=2):
    """body(carry, *aux) -> carry (serialized by data dependency); aux are
    explicit jit arguments (device pytrees allowed)."""

    @functools.partial(jax.jit, static_argnames="K")
    def chained(c, K, *aux):
        def step(c, _):
            return body(c, *aux), ()

        out, _ = jax.lax.scan(step, c, None, length=K)
        # scalar output: fetching the full carry (tens of MB over the
        # tunnel) swamps the per-step signal
        return jnp.sum(out.astype(jnp.float32))

    def run(K):
        np.asarray(chained(x0, K, *aux))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(x0, K, *aux))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    slope = (run(k_hi) - run(k_lo)) / (k_hi - k_lo) * 1e3
    if slope <= 0:
        raise RuntimeError(
            f"non-positive chain slope ({slope:.4f} ms) — measurement "
            "invalid (RPC noise swamped the chain); rerun"
        )
    return slope


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image", type=int, default=256)
    p.add_argument("--only", default=None,
                   help="comma-separated stage filter (substring match)")
    args = p.parse_args()

    def want(name):
        return args.only is None or any(
            s in name for s in args.only.split(",")
        )
    enable_compile_cache()

    from automoe_tpu.configs import default_model_config, load_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.models.automoe import _make_expert
    from automoe_tpu.models.policy import TrajectoryPolicy
    from automoe_tpu.ops.resize import resize_bilinear, resize_weights

    B, S = args.batch, args.image
    dtype = jnp.bfloat16
    cfg = load_model_config(default_model_config())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32), dtype)
    results = {}

    # preprocess: u8 -> resize -> normalize (mats/mean/std are numpy —
    # numpy constants trace as HLO literals and are the prescribed pattern)
    mats = resize_weights(600, 800, S, S, antialias=True)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)

    def prep_body(c, frames):
        x = frames.astype(dtype) / 255.0 + c[0, 0, 0, 0] * jnp.asarray(1e-7, dtype)
        x = resize_bilinear(x, S, S, antialias=True, mats=mats)
        return (x - mean.astype(dtype)) / std.astype(dtype)

    if want("preprocess"):
        frames = jnp.asarray(
            rng.integers(0, 255, (B, 600, 800, 3), dtype=np.uint8)
        )
        results["preprocess"] = timed_chain(prep_body, img, frames)

    # each expert alone (gating-pool serving mode, like bench.py);
    # construction + init only for the stages actually requested
    for i, ecfg in enumerate(cfg.experts):
        name = f"expert_{i}_{ecfg.type}"
        if not (want(name) or want("expert")):
            continue
        expert = _make_expert(ecfg, dtype, name=f"e{i}", upsample=False)
        if ecfg.type == "nuscenes":
            lidar = jnp.zeros((B, 1000, 3), dtype)
            variables = jit_init(
                expert, jax.random.key(0), {"image": img, "lidar": lidar}
            )

            def body(c, variables, lidar, expert=expert):
                out = expert.apply(variables, {"image": c, "lidar": lidar})
                return c + out["class_logits"].mean().astype(dtype) * 1e-7

            results[name] = timed_chain(body, img, variables, lidar)
        else:
            variables = jit_init(expert, jax.random.key(0), img)

            def body(c, variables, expert=expert):
                out = expert.apply(variables, c)
                leaf = out["class_logits"] if isinstance(out, dict) else out
                return c + leaf.mean().astype(dtype) * 1e-7

            results[name] = timed_chain(body, img, variables)

    # policy head alone
    if want("policy"):
        policy = TrajectoryPolicy(
            horizon=cfg.policy.num_waypoints,
            context_dim=cfg.gating.processed_dim,
            backbone_dim=cfg.policy.backbone_dim,
            dtype=dtype,
        )
        ctx = jnp.zeros((B, cfg.gating.processed_dim), dtype)
        pvars = jit_init(policy, jax.random.key(0), img, ctx)

        def pol_body(c, pvars, ctx):
            out = policy.apply(pvars, c, ctx)
            return c + out["waypoints"].mean().astype(dtype) * 1e-7

        results["policy"] = timed_chain(pol_body, img, pvars, ctx)

    # full model (reference point)
    if want("full_model"):
        model = create_automoe_model(cfg, dtype=dtype, fast_gating_pool=True)
        batch = {
            "image": img,
            "lidar": jnp.zeros((B, 1000, 3), dtype),
            "speed": jnp.zeros((B, 1), dtype),
            "steering": jnp.zeros((B, 1), dtype),
            "throttle": jnp.zeros((B, 1), dtype),
            "brake": jnp.zeros((B, 1), dtype),
        }
        mvars = jit_init(model, jax.random.key(0), batch)

        def full_body(c, mvars, batch):
            out = model.apply(mvars, {**batch, "image": c})
            return c + out["waypoints"].mean().astype(dtype) * 1e-7

        results["full_model"] = timed_chain(full_body, img, mvars, batch)

    total_parts = sum(v for k, v in results.items()
                      if k not in ("full_model",))
    results["parts_sum"] = total_parts
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
