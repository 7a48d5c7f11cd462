"""Per-stage int8 component budget (VERDICT r2 weak #1 / next #2).

Times the int8 serving step's pieces on the real TPU with the serialized
scan-chain method (see bench.py header for why naive timing lies on this
tunnel), for BOTH trunk implementations:

  * v1 — bf16 round-trip between convs (r2 shipping path): each conv's
    epilogue writes bf16, the next conv's quantize kernel reads bf16 and
    writes int8 (~5 B/elem of HBM traffic per boundary);
  * q8 — int8-resident (r3): requantization folded into each conv's
    dequant epilogue, activations cross HBM as int8 (~2 B/elem).

Stages: preprocess, float stem (conv1+maxpool+first quant), one full
int8 trunk per variant, all-4-experts trunk cost, heads+gating+policy
residual, and the end-to-end quant step per variant.

Usage: python benchmarks/quant_stage_bench.py [--batch 128]
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

from automoe_tpu.utils import enable_compile_cache, jit_init
from benchmarks.component_bench import timed_chain as _timed_chain


def timed_chain(body, c0, *aux, **kw):
    """Progress-printing wrapper: a timeout'd run still leaves the
    completed stage timings on stderr."""
    r = _timed_chain(body, c0, *aux, **kw)
    print(f"[qsb] stage done: {r:.3f} ms", file=sys.stderr, flush=True)
    return r


def micro(args):
    """Decompose the s2d stem (r3): where do its ~3.2 ms go — conv
    compute, the (possibly unfused) quantize pass, or the pool's HBM
    round trip? Guides the Pallas fused-stem decision."""
    from automoe_tpu.configs import default_model_config, load_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.serving import quantize_automoe
    from automoe_tpu.serving.quant import _s2d_stem_kernel

    B = args.batch
    dtype = jnp.bfloat16
    cfg = load_model_config(default_model_config())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, 256, 256, 3)), dtype)
    model = create_automoe_model(cfg, dtype=dtype, fast_gating_pool=True)
    variables = jit_init(
        model, jax.random.key(0),
        {"image": img, "lidar": jnp.zeros((B, 1000, 3), dtype),
         "speed": jnp.ones((B, 1), dtype), "steering": jnp.zeros((B, 1), dtype),
         "throttle": jnp.zeros((B, 1), dtype), "brake": jnp.zeros((B, 1), dtype)},
    )
    qpack = quantize_automoe(variables, cfg, [{"image": img}], dtype=dtype)
    ks = [np.asarray(_s2d_stem_kernel(np.asarray(q["conv1"]["w"], np.float32)))
          for q in qpack["experts"]]
    kcat = jnp.asarray(np.concatenate(ks, axis=-1), dtype)  # [4,4,12,256]
    bcat = jnp.asarray(np.concatenate(
        [np.asarray(q["conv1"]["b"], np.float32) for q in qpack["experts"]]
    ), dtype)
    inv = jnp.asarray(np.repeat(np.asarray(
        [127.0 / max(float(s["layer1_0/conv1"]), 1e-12)
         for s in qpack["scales"]], np.float32), 64))
    results = {}

    def s2d(x):
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        xs = xp.reshape(B, 132, 2, 132, 2, 3)
        return xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, 132, 132, 12)

    def prep_body(c, x):
        xs = s2d(x + c[0, 0, 0, 0] * jnp.asarray(1e-7, dtype))
        return c + jnp.mean(xs).astype(dtype) * jnp.asarray(1e-7, dtype)

    results["s2d_prep"] = timed_chain(prep_body, img, img)

    xs0 = jax.jit(s2d)(img)

    def conv(xs, k):
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xs, k, (1, 1), "VALID", dimension_numbers=dn
        )[:, :128, :128]

    def conv_body(c, k):
        h = conv(c, k)
        return c + jnp.mean(h).astype(dtype) * jnp.asarray(1e-7, dtype)

    results["s2d_conv_bf16"] = timed_chain(conv_body, xs0, kcat)

    def conv_quant_body(c, k, b, iv):
        h = jax.nn.relu(conv(c, k) + b)
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) * iv), -127, 127
                      ).astype(jnp.int8)
        return c + jnp.max(hq).astype(dtype) * jnp.asarray(1e-7, dtype)

    results["s2d_conv_quant"] = timed_chain(
        conv_quant_body, xs0, kcat, bcat, inv
    )

    h0 = jax.jit(lambda xs, k: conv(xs, k))(xs0, kcat)

    def quant_body(c, b, iv):
        hq = jnp.clip(
            jnp.round(jax.nn.relu(c + b).astype(jnp.float32) * iv),
            -127, 127,
        ).astype(jnp.int8)
        return c + jnp.max(hq).astype(dtype) * jnp.asarray(1e-7, dtype)

    results["quant_pass_bf16_to_int8"] = timed_chain(quant_body, h0, bcat, inv)

    hq0 = jax.jit(
        lambda h, b, iv: jnp.clip(
            jnp.round(jax.nn.relu(h + b).astype(jnp.float32) * iv),
            -127, 127).astype(jnp.int8)
    )(h0, bcat, inv)

    def pool_body(c):
        out = jax.lax.reduce_window(
            c, np.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        # int8 carry: feed a slice of the pooled map back into the carry
        return c.at[:, :64, :64].max(out)

    results["pool_int8"] = timed_chain(pool_body, hq0)

    print(json.dumps({
        "metric": "s2d_stem_micro", "batch": B,
        "stages_ms": {k: round(v, 3) for k, v in results.items()},
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--micro", action="store_true",
                   help="s2d stem sub-stage decomposition only")
    args = p.parse_args()
    if args.micro:
        enable_compile_cache()
        return micro(args)
    enable_compile_cache()

    from automoe_tpu.configs import default_model_config, load_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.ops.resize import resize_bilinear, resize_weights
    from automoe_tpu.serving import make_quant_forward, quantize_automoe
    from automoe_tpu.serving.quant import (
        resnet_quant_forward,
        resnet_quant_forward_q8,
    )

    B = args.batch
    dtype = jnp.bfloat16
    cfg = load_model_config(default_model_config())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, 256, 256, 3)), dtype)
    mats = resize_weights(600, 800, 256, 256, antialias=True)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    frames = jnp.asarray(rng.integers(0, 255, (B, 600, 800, 3), dtype=np.uint8))

    def make_batch(image, speed):
        zeros = jnp.zeros((image.shape[0], 1), dtype)
        return {"image": image,
                "lidar": jnp.zeros((image.shape[0], 1000, 3), dtype),
                "speed": speed.astype(dtype), "steering": zeros,
                "throttle": zeros, "brake": zeros}

    model = create_automoe_model(cfg, dtype=dtype, fast_gating_pool=True)
    variables = jit_init(
        model, jax.random.key(0), make_batch(img, jnp.ones((B, 1), dtype))
    )
    qpack = quantize_automoe(variables, cfg, [{"image": img}], dtype=dtype)
    qexperts = jax.tree.map(jnp.asarray, qpack["experts"])
    scales = qpack["scales"]
    results = {}

    # preprocess (same as the bf16 budget — shared between paths)
    def prep(c, f):
        x = f.astype(dtype) / 255.0 + c[0, 0, 0, 0] * jnp.asarray(1e-7, dtype)
        x = resize_bilinear(x, 256, 256, antialias=True, mats=mats)
        return (x - mean.astype(dtype)) / std.astype(dtype)

    results["preprocess"] = timed_chain(prep, img, frames)

    # one int8 trunk, each variant (the image-shaped CARRY feeds the trunk
    # so nothing hoists; no device arrays are closed over — landmine 1)
    def trunk_body(fwd):
        def chain(c, q):
            feats = fwd(q, scales[0], c, dtype=dtype)  # [B,8,8,512]
            return c + jnp.mean(feats).astype(dtype) * jnp.asarray(1e-7, dtype)

        return chain

    results["trunk_v1"] = timed_chain(
        trunk_body(resnet_quant_forward), img, qexperts[0]
    )
    results["trunk_q8"] = timed_chain(
        trunk_body(resnet_quant_forward_q8), img, qexperts[0]
    )

    # float stem alone (conv1 + maxpool + first quantize) — the piece the
    # DEFAULT_FLOAT_CONVS decision protects
    from automoe_tpu.serving.quant import _conv

    def stem(c, q):
        p = q["conv1"]
        h = _conv(c.astype(dtype), jnp.asarray(p["w"], dtype), 2, 3) + \
            jnp.asarray(p["b"], dtype)
        h = jax.lax.reduce_window(
            jax.nn.relu(h), -jnp.inf, jax.lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        s = np.float32(127.0 / max(scales[0]["layer1_0/conv1"], 1e-12))
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) * s), -127, 127)
        return c + jnp.mean(hq).astype(dtype) * jnp.asarray(1e-7, dtype)

    results["stem_float_quant"] = timed_chain(stem, img, qexperts[0])

    # all four stems as ONE dense conv + one per-channel quantize (r3)
    from automoe_tpu.serving.quant import fused_stems_q8

    def stems_fused(c, qx):
        outs = fused_stems_q8(qx, scales, c, dtype=dtype)
        acc = sum(jnp.sum(o[0].astype(jnp.float32)) for o in outs)
        return c + acc.astype(dtype) * jnp.asarray(1e-12, dtype)

    results["stems_fused_all4"] = timed_chain(stems_fused, img, qexperts)

    # s2d stems: one 4x4 s1 conv over the 2x2 space-to-depth image with
    # int8 output BEFORE the maxpool (r3; see stems_s2d_q8)
    from automoe_tpu.serving.quant import stems_s2d_q8

    def stems_s2d(c, qx):
        outs = stems_s2d_q8(qx, scales, c, dtype=dtype)
        acc = sum(jnp.sum(o[0].astype(jnp.float32)) for o in outs)
        return c + acc.astype(dtype) * jnp.asarray(1e-12, dtype)

    results["stems_s2d_all4"] = timed_chain(stems_s2d, img, qexperts)

    # end-to-end quant step per variant (preprocess + 4 trunks + heads);
    # the speed CARRY serializes through preprocess, like quant_bench.py
    speed0 = jnp.ones((B, 1), jnp.float32)
    variants = {"v1": ("v1", "solo"), "q8": ("q8", "solo"),
                "q8s2d": ("q8", "s2d")}
    for tag, (trunk, stem_kind) in variants.items():
        fwd = make_quant_forward(
            cfg, scales, dtype=dtype, trunk=trunk, stem=stem_kind
        )

        def e2e(c, qx, fr, v):
            x = fr.astype(dtype) / 255.0 + c[0, 0] * jnp.asarray(1e-7, dtype)
            x = resize_bilinear(x, 256, 256, antialias=True, mats=mats)
            x = (x - mean.astype(dtype)) / std.astype(dtype)
            out = fwd(v, qx, make_batch(x, c))
            return out["speed_seq"][:, -1:].astype(jnp.float32)

        results[f"e2e_{tag}"] = timed_chain(
            e2e, speed0, qexperts, frames, variables
        )

    flops_per_frame_g = 19.749  # bench.py ledger value
    out = {"metric": "int8_stage_budget", "batch": B, "stages_ms": {
        k: round(v, 3) for k, v in results.items()
    }}
    for tag in variants:
        ms = results[f"e2e_{tag}"]
        fps = B / ms * 1e3
        out[f"fps_{tag}"] = round(fps, 1)
        # int8 MFU vs the v5e's 394 TOPS (bf16 stem+heads under-counted
        # as int8 work — this is the conservative convention BENCHMARKS.md
        # uses)
        out[f"int8_mfu_{tag}"] = round(
            fps * flops_per_frame_g * 1e9 / 394e12, 4
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
