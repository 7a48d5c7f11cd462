"""Headline benchmark: end-to-end camera-frame preprocessing + full AutoMoE
forward (4 experts + gating + policy), frames/sec on one TPU chip.

Mirrors the reference inference regime (800x600 camera -> 256x256 model
input, inference/run_automoe.py:25-31,166-170) but runs the whole
pipeline — uint8 decode-side normalize/resize included — as ONE jitted XLA
computation in bf16. Baseline: the driver north star of 5k frames/sec/chip
(BASELINE.json; the reference publishes no numbers).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from automoe_tpu.utils import enable_compile_cache

enable_compile_cache()
import numpy as np


def build_pipeline(batch_size: int, dtype=jnp.bfloat16):
    from automoe_tpu.configs import default_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.utils import jit_init

    model = create_automoe_model(default_model_config(), dtype=dtype)

    mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype)

    from automoe_tpu.ops.resize import resize_bilinear, resize_weights

    # resize matrices must be runtime ARGUMENTS, not embedded constants
    # (constant-heavy executables poison dispatch latency on the tunnel
    # runtime — see automoe_tpu/ops/resize.py docstring)
    mats_host = resize_weights(600, 800, 256, 256, antialias=True)
    mats = tuple(jax.device_put(m) for m in mats_host)

    def preprocess(frames_u8, mats):
        # [B, 600, 800, 3] uint8 -> [B, 256, 256, 3] normalized. The resize
        # runs as two MXU matmuls and the normalize fuses around them.
        x = frames_u8.astype(dtype) / 255.0
        x = resize_bilinear(x, 256, 256, antialias=True, mats=mats)
        return (x - mean) / std

    def make_batch(frames_u8, speed, mats):
        B = frames_u8.shape[0]
        zeros = jnp.zeros((B, 1), dtype)
        return {
            "image": preprocess(frames_u8, mats),
            "lidar": jnp.zeros((B, 1000, 3), dtype),
            "speed": speed.astype(dtype),
            "steering": zeros,
            "throttle": zeros,
            "brake": zeros,
        }

    init_batch = {
        "image": jnp.zeros((batch_size, 256, 256, 3), dtype),
        "lidar": jnp.zeros((batch_size, 1000, 3), dtype),
        "speed": jnp.zeros((batch_size, 1), dtype),
        "steering": jnp.zeros((batch_size, 1), dtype),
        "throttle": jnp.zeros((batch_size, 1), dtype),
        "brake": jnp.zeros((batch_size, 1), dtype),
    }
    variables = jit_init(model, jax.random.key(0), init_batch)

    @jax.jit
    def _step(variables, mats, frames_u8, speed):
        out = model.apply(variables, make_batch(frames_u8, speed, mats))
        return out["waypoints"], out["speed"], out["expert_weights"]

    def step(variables, frames_u8, speed):
        return _step(variables, mats, frames_u8, speed)

    return step, variables


def bench_throughput(batch_size=256, iters=30, warmup=5):
    step, variables = build_pipeline(batch_size)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch_size, 600, 800, 3), dtype=np.uint8)
    )
    speed = jnp.ones((batch_size, 1), jnp.float32)

    for _ in range(warmup):
        out = step(variables, frames, speed)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, frames, speed)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def bench_latency(iters=100):
    step, variables = build_pipeline(1)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 600, 800, 3), dtype=np.uint8))
    speed = jnp.ones((1, 1), jnp.float32)
    for _ in range(10):
        jax.block_until_ready(step(variables, frames, speed))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(step(variables, frames, speed))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50) * 1e3)


def main():
    fps = bench_throughput()
    p50_ms = bench_latency()
    baseline_fps = 5000.0  # BASELINE.json north star (v5e target)
    result = {
        "metric": "automoe_e2e_preprocess_forward_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 3),
        "extra": {
            "p50_latency_ms_bs1": round(p50_ms, 3),
            "latency_target_ms": 10.0,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
