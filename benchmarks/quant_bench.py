"""int8-quantized serving step vs the bf16 headline step (B=128, v5e).

Same program shape as bench.py (uint8 frames → resize → normalize → full
AutoMoE with fast gating pool), with the four expert trunks in int8.

Usage: python benchmarks/quant_bench.py [--batch 128]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    enable_compile_cache()

    from automoe_tpu.configs import default_model_config, load_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.ops.resize import resize_bilinear, resize_weights
    from automoe_tpu.serving import make_quant_forward, quantize_automoe

    B = args.batch
    dtype = jnp.bfloat16
    cfg = load_model_config(default_model_config())
    rng = np.random.default_rng(0)
    mats = resize_weights(600, 800, 256, 256, antialias=True)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    frames = jnp.asarray(rng.integers(0, 255, (B, 600, 800, 3), dtype=np.uint8))

    def preprocess(frames_u8, s):
        x = frames_u8.astype(dtype) / 255.0
        x = x + s[0, 0] * jnp.asarray(1e-7, dtype)
        x = resize_bilinear(x, 256, 256, antialias=True, mats=mats)
        return (x - mean.astype(dtype)) / std.astype(dtype)

    def make_batch(img, speed):
        zeros = jnp.zeros((img.shape[0], 1), dtype)
        return {"image": img, "lidar": jnp.zeros((img.shape[0], 1000, 3), dtype),
                "speed": speed.astype(dtype), "steering": zeros,
                "throttle": zeros, "brake": zeros}

    model = create_automoe_model(cfg, dtype=dtype, fast_gating_pool=True)
    init_batch = make_batch(jnp.zeros((B, 256, 256, 3), dtype),
                            jnp.zeros((B, 1), dtype))
    variables = jit_init(model, jax.random.key(0), init_batch)

    # calibrate on a preprocessed batch (random frames — scale-realistic)
    calib_img = jax.jit(preprocess)(frames, jnp.ones((B, 1), dtype))
    qpack = quantize_automoe(variables, cfg, [{"image": calib_img}], dtype=dtype)
    fwd = make_quant_forward(cfg, qpack["scales"], dtype=dtype)
    qexperts = jax.tree.map(jnp.asarray, qpack["experts"])

    @functools.partial(jax.jit, static_argnames="K")
    def chained(variables, qexperts, frames_u8, speed, K):
        def body(s, _):
            out = fwd(variables, qexperts,
                      make_batch(preprocess(frames_u8, s), s))
            return out["speed_seq"][:, -1:].astype(jnp.float32), ()

        final, _ = jax.lax.scan(body, speed, None, length=K)
        return jnp.sum(final)

    speed = jnp.ones((B, 1), jnp.float32)

    def run(K):
        np.asarray(chained(variables, qexperts, frames, speed, K))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(variables, qexperts, frames, speed, K))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = max((run(10) - run(2)) / 8 * 1e3, 1e-6)
    print(json.dumps({
        "metric": "automoe_int8_serving_throughput",
        "step_ms": round(ms, 3),
        "fps": round(B / ms * 1e3, 1),
        "batch": B,
    }))


if __name__ == "__main__":
    main()
