"""Headline benchmark: end-to-end camera-frame preprocessing + full AutoMoE
forward (4 experts + gating + policy) on one TPU chip.

Mirrors the reference inference regime (800x600 camera → 256x256 model
input, inference/run_automoe.py:25-31,166-170) with the whole pipeline —
uint8 → resize (MXU matmuls) → normalize → AutoMoE — as one jitted bf16
XLA computation.

Measurement methodology (this runtime's RPC tunnel makes naive wall-clock
timing lie: `block_until_ready` acks before device completion, and a host
fetch costs a ~45 ms round trip):
  * device throughput = slope between two `lax.scan` chain lengths run in
    ONE program (K=4 vs K=20 model steps, serialized by a carry→image data
    dependency so nothing is hoisted out of the loop) — RPC overhead
    cancels in the difference;
  * device latency (batch 1) = the same per-step slope at B=1;
  * host round-trip latency is also reported (includes tunnel RPC; on a
    real deployment host this term is PCIe-microseconds, not ~45 ms).

Baseline: the driver north star of 5k frames/sec/chip (BASELINE.json; the
reference publishes no numbers). Prints one JSON line.
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

import numpy as np

from automoe_tpu.utils import enable_compile_cache


def build_chain(batch_size: int, dtype=jnp.bfloat16):
    from automoe_tpu.configs import default_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.ops.resize import resize_bilinear, resize_weights
    from automoe_tpu.utils import jit_init

    # fast_gating_pool: the bench consumes only waypoints/speed/weights, so
    # the seg experts' full-res maps are skipped (exact-equivalent gating
    # inputs; see models/automoe.py)
    model = create_automoe_model(
        default_model_config(), dtype=dtype, fast_gating_pool=True
    )
    # numpy constants: closed-over *device* arrays poison dispatch latency
    # on this runtime; numpy traces as an HLO literal and is fine.
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    mats = resize_weights(600, 800, 256, 256, antialias=True)  # numpy

    def make_batch(img, speed):
        B = img.shape[0]
        zeros = jnp.zeros((B, 1), dtype)
        return {
            "image": img,
            "lidar": jnp.zeros((B, 1000, 3), dtype),
            "speed": speed.astype(dtype),
            "steering": zeros,
            "throttle": zeros,
            "brake": zeros,
        }

    def preprocess(frames_u8, s):
        x = frames_u8.astype(dtype) / 255.0
        # tiny carry-dependent term keeps every stage inside the scan loop
        x = x + s[0, 0] * jnp.asarray(1e-7, dtype)
        x = resize_bilinear(x, 256, 256, antialias=True, mats=mats)
        return (x - mean.astype(dtype)) / std.astype(dtype)

    init_batch = make_batch(
        jnp.zeros((batch_size, 256, 256, 3), dtype),
        jnp.zeros((batch_size, 1), dtype),
    )
    variables = jit_init(model, jax.random.key(0), init_batch)

    @functools.partial(jax.jit, static_argnames="K")
    def chained(variables, frames_u8, speed, K):
        def body(s, _):
            out = model.apply(variables, make_batch(preprocess(frames_u8, s), s))
            return out["speed_seq"][:, -1:].astype(jnp.float32), ()

        final, _ = jax.lax.scan(body, speed, None, length=K)
        return final

    @jax.jit
    def single(variables, frames_u8, speed):
        out = model.apply(variables, make_batch(preprocess(frames_u8, speed), speed))
        return out["waypoints"], out["speed"], out["expert_weights"]

    return chained, single, variables


def _timed_fetch(fn, reps: int = 4) -> float:
    np.asarray(jax.tree.leaves(fn())[0])  # warm + real completion
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn())[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def device_per_step_ms(batch_size: int, k_lo=4, k_hi=20, reps=4,
                       built=None) -> float:
    chained, _, variables = built if built is not None else build_chain(batch_size)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (batch_size, 600, 800, 3), dtype=np.uint8)
    )
    speed = jnp.ones((batch_size, 1), jnp.float32)
    t_lo = _timed_fetch(lambda: chained(variables, frames, speed, k_lo), reps)
    t_hi = _timed_fetch(lambda: chained(variables, frames, speed, k_hi), reps)
    slope = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
    if slope <= 0:
        # a non-positive chain-length slope is a failed measurement (RPC
        # noise swamped the chain) — retry once, then surface a marker
        # instead of clamping to an absurdly-fast fake number
        t_lo = _timed_fetch(lambda: chained(variables, frames, speed, k_lo), reps)
        t_hi = _timed_fetch(lambda: chained(variables, frames, speed, k_hi), reps)
        slope = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
    if slope <= 0:
        raise RuntimeError(
            f"non-positive device-time slope ({slope:.4f} ms/step) — "
            "measurement invalid, not clamping to a fake number"
        )
    return slope


def host_roundtrip_ms(reps: int = 20, built=None) -> float:
    _, single, variables = built if built is not None else build_chain(1)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (1, 600, 800, 3), dtype=np.uint8))
    speed = jnp.ones((1, 1), jnp.float32)
    np.asarray(single(variables, frames, speed)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(single(variables, frames, speed)[0])
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50) * 1e3)


def _flops_per_frame(batch_size: int, built=None) -> float:
    """Analytic FLOPs per frame from XLA's compiled cost analysis of the
    single-step program (preprocess + full AutoMoE forward)."""
    _, single, variables = built if built is not None else build_chain(batch_size)
    frames = jnp.zeros((batch_size, 600, 800, 3), jnp.uint8)
    speed = jnp.ones((batch_size, 1), jnp.float32)
    try:
        cost = single.lower(variables, frames, speed).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / batch_size
    except Exception:
        return 0.0


# v5e peak dense bf16 matmul throughput (per chip)
_V5E_PEAK_FLOPS = 197e12


def _training_figures() -> dict:
    """Device-step TRAINING throughput for the two flagship pipelines, so
    BENCH_rN regression-tracks the training path alongside serving
    (VERDICT r3 item 7): the BDD detection step (fwd+bwd+AdamW with the
    on-device auction_pallas matcher, B=32/256²) and the cached-gating
    step (frozen-expert feature cache, the production T7 configuration).
    Each uses the serialized-chain differencing methodology of its source
    bench. Failures degrade to an error marker instead of killing the
    headline metric. BENCH_SKIP_TRAIN=1 skips both (fast-path escape for
    time-boxed callers — cold-compile of the detection step is minutes;
    NEVER timeout-kill this script instead, a mid-compile kill wedges the
    tunnel relay for hours: CLAUDE.md landmine 4, outages #1-#3)."""
    import os
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    out = {}
    skip_env = os.environ.get("BENCH_SKIP_TRAIN", "").strip().lower()
    if skip_env in ("1", "true", "yes", "on"):
        out["train_figures_skipped"] = f"BENCH_SKIP_TRAIN={skip_env}"
        return out
    if skip_env and skip_env not in ("0", "false", "no", "off"):
        print(f"[bench] WARNING: unrecognized BENCH_SKIP_TRAIN={skip_env!r}; "
              "running train figures (use 1/true/yes to skip)",
              file=sys.stderr)
    try:
        from benchmarks.train_step_bench import run as det_run

        det = det_run("auction_pallas")
        out["train_detection_samples_per_sec"] = det["samples_per_sec"]
        out["train_detection_step_ms_bs32"] = det["step_ms"]
    except Exception as e:  # pragma: no cover - defensive bench path
        out["train_detection_error"] = repr(e)[:200]
    try:
        from benchmarks.gating_train_bench import measure_cached_step_ms

        ms = measure_cached_step_ms()
        out["train_cached_gating_step_ms_bs32"] = round(ms, 3)
        out["train_cached_gating_samples_per_sec"] = round(32 / ms * 1e3, 1)
    except Exception as e:  # pragma: no cover - defensive bench path
        out["train_cached_gating_error"] = repr(e)[:200]
    return out


def _init_watchdog():
    """Fail fast if the TPU tunnel is wedged instead of hanging forever
    (shared helper: benchmarks/watchdog.py). The driver contract says
    bench.py ALWAYS prints one metric JSON line — the payload below is
    that line's skeleton for the wedged case."""
    from benchmarks.watchdog import init_watchdog

    init_watchdog({
        "metric": "automoe_e2e_preprocess_forward_throughput",
        "value": 0.0, "unit": "frames/sec/chip", "vs_baseline": 0.0,
    }, exit_code=3)


def main():
    t_start = time.perf_counter()
    _init_watchdog()
    enable_compile_cache()
    B = 128
    built_b = build_chain(B)   # one model build + compile per batch size
    built_1 = build_chain(1)
    step_ms = device_per_step_ms(B, built=built_b)
    fps = B / (step_ms / 1e3)
    lat_ms = device_per_step_ms(1, k_lo=4, k_hi=36, reps=4, built=built_1)
    rt_ms = host_roundtrip_ms(built=built_1)
    flops_frame = _flops_per_frame(B, built=built_b)
    mfu = flops_frame * fps / _V5E_PEAK_FLOPS if flops_frame else 0.0
    baseline_fps = 5000.0  # BASELINE.json north star (v5e target)
    result = {
        "metric": "automoe_e2e_preprocess_forward_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 3),
        "extra": {
            "device_step_ms_bs128": round(step_ms, 3),
            "device_latency_ms_bs1": round(lat_ms, 3),
            "host_roundtrip_ms_bs1": round(rt_ms, 3),
            "flops_per_frame_g": round(flops_frame / 1e9, 3),
            "mfu": round(mfu, 4),
            # opt-in int8 PTQ serving path (automoe_tpu/serving/quant.py).
            # RECORDED from `python benchmarks/quant_bench.py` on
            # 2026-08-17 (13.37 ms / 9,575 fps at B=128 via the r3
            # int8-resident trunk + s2d fused stem defaults) — NOT
            # re-measured per bench run; rerun quant_bench after touching
            # serving/quant.py.
            "int8_serving_fps_recorded": 9575.4,
            "latency_target_ms": 10.0,
            "device": str(jax.devices()[0]),
            **_training_figures(),
        },
    }
    result["extra"]["bench_wall_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
