"""Sustained multi-epoch training on the real chip — the epoch is the
product (VERDICT r3 item 1).

Runs the two flagship pipelines through the REAL Trainer (metrics JSONL,
per-epoch validation, best/last checkpointing — train/loop.py, the same
fit() the CLI drives) for N full epochs each, and reports per-epoch
wall-clock samples/s against the device-step bound measured by the same
serialized-chain methodology as the step microbenches:

 - `gating-cached`: the flagship T7 configuration
   (`--cache-expert-features`) — frozen-expert pooled features; the
   per-sample working set is a few hundred floats, so a full epoch
   stages HBM-resident up front (data/device_resident.py) and
   reshuffles on device each epoch.
 - `detection`: the BDD detection expert step (fwd+bwd+AdamW with the
   on-device auction_pallas matcher, B=32/256²) — full-epoch image
   residency would not fit HBM, so a pool of distinct batches stays
   resident and cycles with fresh per-epoch permutations (ledgered:
   repeated data; throughput is the claim here, convergence is pinned
   by the trajectory-parity suite).

Why device-resident: this environment's ~50 MB/s tunnel makes per-batch
H2D the confound (613 ms/step vs a 16 ms device step — BENCHMARKS.md
"Trainer-loop pipelining"); a production TPU pod host feeds chips from
local NVMe and doesn't have this constraint, but the *loop machinery*
(grouped scan dispatch, bounded in-flight metrics fetches, logging,
validation, checkpointing) is exactly what this run exercises and what
was previously only extrapolated. Reference counterpart: the epoch loop
of training/train_bdd100k_ddp.py:75-185.

Usage: python benchmarks/sustained_epoch_bench.py [--pipeline both]
    [--epochs 3] [--out runs/sustained]
Run in BACKGROUND with a generous timeout; never kill mid-compile
(CLAUDE.md landmine 4).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


SMOKE = False  # --smoke: tiny shapes for a CPU plumbing check


def build_detection(epochs: int):
    """Detection pipeline: resident pool of P×K×B distinct samples."""
    import jax.numpy as jnp

    from automoe_tpu.data.device_resident import DeviceEpochLoader
    from automoe_tpu.train.loop import TrainConfig, Trainer
    from automoe_tpu.train.workloads import bdd_expert_workload

    B, S, cap, K, P = 32, 256, 48, 8, 4
    steps_per_epoch = 1024  # 32,768 samples/epoch
    if SMOKE:
        B, S, cap, K, P, steps_per_epoch = 4, 32, 8, 2, 2, 8
    rng = np.random.default_rng(0)
    n = B * K * P
    arrays = {
        "image": rng.normal(size=(n, S, S, 3)).astype(np.float32),
        "bboxes": rng.uniform(0.1, 0.9, (n, cap, 4)).astype(np.float32),
        "labels": np.where(
            np.arange(cap)[None, :] < 12,
            rng.integers(0, 10, (n, cap)), -1
        ).astype(np.int32),
    }
    val_arrays = {
        k: v[: B * 8] for k, v in arrays.items()
    }
    wl = bdd_expert_workload(
        "detection", image_size=S, box_cap=cap, matcher="auction_pallas",
        dtype=jnp.float32,
    )
    train_loader = DeviceEpochLoader(
        arrays, batch_size=B, group_size=K,
        steps_per_epoch=steps_per_epoch, seed=0,
    )
    val_loader = DeviceEpochLoader(
        val_arrays, batch_size=B, group_size=1, seed=1, shuffle=False,
    )
    cfg = TrainConfig(
        epochs=epochs, learning_rate=2e-4, weight_decay=1e-4,
        optimizer="adamw", schedule="cosine", steps_per_call=K,
        run_name="sustained_detection", log_every=256, max_inflight=2,
    )
    return wl, train_loader, val_loader, cfg, B

    # bound: benchmarks/train_step_bench.run("auction_pallas")


def build_gating_cached(epochs: int):
    """Flagship cached-gating pipeline: full epoch HBM-resident."""
    import jax.numpy as jnp

    from automoe_tpu.configs import default_model_config
    from automoe_tpu.data.device_resident import DeviceEpochLoader
    from automoe_tpu.train.loop import TrainConfig, Trainer  # noqa: F401
    from automoe_tpu.train.workloads import (
        gating_workload,
        pooled_feature_dim,
    )

    B, K = 32, 16
    steps_per_epoch = 4096  # 131,072 samples/epoch
    S = 256
    # resident pool: REAL-SIZED frames are staged (r5 fix — the policy
    # head trains through its own image backbone, so frames are live
    # step inputs; the r4 4x4-dummy staging measured a ~0.1 ms crippled
    # step instead of the 4.5 ms production step). fp32 frames are
    # 786 KB each: n=4096 keeps flat+grouped copies ≈ 6.4 GiB, inside
    # the v5e's 16 GiB with headroom; the epoch cycles the pool 32x
    # (pool diversity is irrelevant to throughput measurement).
    n = 4096
    if SMOKE:
        B, K, steps_per_epoch, n, S = 4, 2, 8, 16, 32
    mc = default_model_config()
    wl = gating_workload(mc, image_size=S, dtype=jnp.float32,
                         cache_features=True)
    horizon = wl.example_batch["waypoints"].shape[1]
    cfg_model = wl.model.config
    rng = np.random.default_rng(0)
    arrays = {
        "image": rng.normal(size=(n, S, S, 3)).astype(np.float32) * 0.5,
        "speed": rng.uniform(0, 10, (n, horizon)).astype(np.float32),
        "steering": rng.normal(size=(n, horizon)).astype(np.float32) * 0.3,
        "throttle": rng.uniform(0, 1, (n, horizon)).astype(np.float32),
        "brake": np.zeros((n, horizon), np.float32),
        "waypoints": rng.normal(size=(n, horizon, 2)).astype(np.float32),
    }
    for i, ecfg in enumerate(cfg_model.experts):
        arrays[f"expert_pooled_{i}"] = rng.normal(
            size=(n, pooled_feature_dim(ecfg))
        ).astype(np.float32)
    nv = B * 16
    val_arrays = {k: v[:nv] for k, v in arrays.items()}
    train_loader = DeviceEpochLoader(
        arrays, batch_size=B, group_size=K,
        steps_per_epoch=steps_per_epoch, seed=0,
    )
    val_loader = DeviceEpochLoader(
        val_arrays, batch_size=B, group_size=1, seed=1, shuffle=False,
    )
    from automoe_tpu.train.loop import TrainConfig

    cfg = TrainConfig(
        epochs=epochs, learning_rate=4e-4, weight_decay=1e-4,
        optimizer="adamw", schedule="cosine_per_epoch", steps_per_call=K,
        run_name="sustained_gating_cached", log_every=1024, max_inflight=2,
    )
    return wl, train_loader, val_loader, cfg, B


def run_pipeline(name: str, epochs: int, out_root: str,
                 interleave: bool = False, k_lo: int = 2, k_hi: int = 12):
    from automoe_tpu.train.loop import Trainer

    build = {"detection": build_detection,
             "gating-cached": build_gating_cached}[name]
    wl, train_loader, val_loader, cfg, B = build(epochs)
    cfg.ckpt_root = os.path.join(out_root, "ckpt")
    cfg.runs_root = os.path.join(out_root, "runs")
    t_build0 = time.time()
    trainer = Trainer(wl, train_loader, val_loader, cfg, mesh=None)

    # Interleaved-bound protocol (r5, VERDICT r4 item 4 + ADVICE r4):
    # the r4 runs measured the device-step bound ONCE per day, so relay
    # jitter between the bound measurement and each epoch was not
    # separable from loop overhead — and a best-epoch fraction of 1.15x
    # a same-day bound is a measurement discrepancy, not a win (a fully
    # synced epoch cannot beat a differenced chain of the same step).
    # Here the SAME measurer (one jitted chain, compiled once) re-runs
    # immediately after every epoch in the same process: each epoch is
    # scored against its same-minute bound, so jitter moves numerator
    # and denominator together. A longer chain (k_lo/k_hi CLI) tightens
    # the slope against per-rep jitter.
    bounds_log = []
    if interleave and name == "gating-cached":
        from benchmarks.gating_train_bench import make_cached_step_measurer

        measurer = make_cached_step_measurer(
            batch=B, image=(32 if SMOKE else 256),
            k_lo=k_lo, k_hi=k_hi, reps=3
        )
        t_m = time.time()
        pre = measurer()
        bounds_log.append({
            "after_epoch": 0, "step_ms": round(pre, 3),
            # sub-noise slope -> 0 on CPU smoke runs (timed_scan warns);
            # report None rather than dividing by zero
            "bound_samples_per_sec": (round(B / pre * 1e3, 1)
                                      if pre > 0 else None),
            "measure_s": round(time.time() - t_m, 1),
        })
        print(json.dumps({"interleaved_bound": bounds_log[-1]}),
              flush=True)

        def hook(epoch):
            t_m = time.time()
            ms = measurer()
            bounds_log.append({
                "after_epoch": epoch + 1, "step_ms": round(ms, 3),
                "bound_samples_per_sec": (round(B / ms * 1e3, 1)
                                          if ms > 0 else None),
                "measure_s": round(time.time() - t_m, 1),
            })
            print(json.dumps({"interleaved_bound": bounds_log[-1]}),
                  flush=True)

        trainer.epoch_hook = hook

    t_fit0 = time.time()
    result = trainer.fit()
    t_fit = time.time() - t_fit0

    # per-epoch wall-clock from the run's own metrics JSONL
    run_dir = Path(cfg.runs_root) / f"{wl.name}_{cfg.run_name}"
    epochs_rows = []
    with open(run_dir / "metrics.jsonl") as fh:
        for line in fh:
            rec = json.loads(line)
            if "train/epoch_seconds" in rec:
                epochs_rows.append(rec)
    epochs_rows = epochs_rows[-epochs:]  # JSONL appends across re-runs
    per_epoch = [
        {
            "epoch_seconds": round(r["train/epoch_seconds"], 2),
            "steps_per_sec": round(r["train/steps_per_sec"], 2),
            "samples_per_sec": round(r["train/steps_per_sec"] * B, 1),
            "loss": round(r["train/loss_epoch"], 4),
        }
        for r in epochs_rows
    ]
    if bounds_log:
        # score each epoch against the bound measured IMMEDIATELY after
        # it (same-minute tunnel conditions); epoch i uses bounds_log
        # entry with after_epoch == i+1
        by_epoch = {b["after_epoch"]: b for b in bounds_log}
        fractions = []
        for i, row in enumerate(per_epoch):
            b = by_epoch.get(i + 1)
            if b and b["bound_samples_per_sec"]:
                frac = row["samples_per_sec"] / b["bound_samples_per_sec"]
                row["same_minute_bound_samples_per_sec"] = (
                    b["bound_samples_per_sec"]
                )
                row["fraction_of_same_minute_bound"] = round(frac, 3)
                if i > 0:  # epoch 1 is compile-dominated; exclude
                    fractions.append(frac)
        extra = {
            "interleaved_bounds": bounds_log,
            "median_postcompile_fraction": (
                round(float(np.median(fractions)), 3) if fractions else None
            ),
        }
    else:
        extra = {}
    return {
        **extra,
        "pipeline": name,
        "batch_size": B,
        "steps_per_call": cfg.steps_per_call,
        "steps_per_epoch": len(train_loader),
        "epochs": epochs,
        "init_seconds": round(t_fit0 - t_build0, 1),
        "fit_wall_seconds": round(t_fit, 1),
        "best_val_loss": result.get("best_val_loss"),
        "per_epoch": per_epoch,
        "run_dir": str(run_dir),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pipeline", default="both",
                   choices=["both", "detection", "gating-cached"])
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--out", default="runs/sustained")
    p.add_argument("--bounds", action="store_true",
                   help="also measure the device-step bounds (adds the "
                        "step microbenches' compile+run time)")
    p.add_argument("--interleave-bounds", action="store_true",
                   help="gating-cached only: re-measure the device-step "
                        "bound BETWEEN epochs in the same process and "
                        "score each epoch against its same-minute bound "
                        "(the jitter-proof protocol; VERDICT r4 item 4)")
    p.add_argument("--k-lo", type=int, default=2)
    p.add_argument("--k-hi", type=int, default=12,
                   help="chain lengths for the interleaved bound; longer "
                        "chains tighten the slope against relay jitter "
                        "(e.g. --k-lo 8 --k-hi 40)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes on CPU — plumbing check, not a bench")
    args = p.parse_args()

    if args.smoke:
        global SMOKE
        SMOKE = True
        import jax

        jax.config.update("jax_platforms", "cpu")

    from benchmarks.watchdog import init_watchdog

    dev = init_watchdog()[0]  # backend init under the wedge timer
    from automoe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    names = (["detection", "gating-cached"] if args.pipeline == "both"
             else [args.pipeline])
    out = {"device": str(dev)}
    for name in names:
        out[name] = run_pipeline(
            name, args.epochs, args.out,
            interleave=args.interleave_bounds,
            k_lo=args.k_lo, k_hi=args.k_hi,
        )
        print(json.dumps({name: out[name]}), flush=True)

    if args.bounds:
        from benchmarks.gating_train_bench import measure_cached_step_ms
        from benchmarks.train_step_bench import run as det_run

        bounds = {}
        if "detection" in names:
            det = det_run("auction_pallas")
            bounds["detection_step_ms"] = det["step_ms"]
            bounds["detection_bound_samples_per_sec"] = det["samples_per_sec"]
        if "gating-cached" in names:
            ms = measure_cached_step_ms()
            bounds["gating_cached_step_ms"] = round(ms, 3)
            bounds["gating_cached_bound_samples_per_sec"] = round(
                32 / ms * 1e3, 1)
        out["bounds"] = bounds
        for name in names:
            key = ("detection_bound_samples_per_sec" if name == "detection"
                   else "gating_cached_bound_samples_per_sec")
            bound = bounds.get(key)
            if bound:
                for row in out[name]["per_epoch"]:
                    row["fraction_of_bound"] = round(
                        row["samples_per_sec"] / bound, 3)
        print(json.dumps({"bounds": bounds}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
