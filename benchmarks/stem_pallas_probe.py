"""Real-TPU validation probe for the fused Pallas stem kernel
(ops/pallas_stem.py, BlockSpec-auto-copy revision).

The kernel is pinned bit-exact against the XLA path in interpret mode
(tests/test_pallas_stem.py); this probe answers the two questions only
the real chip can: does THIS runtime's Mosaic lower it (the previous
manual-DMA revision died on a 12-lane DMA destination — probe matrix in
BENCHMARKS.md), and what does it save end-to-end (the XLA path spends
~1.5 ms/B=128 materializing + re-reading the 537 MB pre-pool tensor;
roofline says the fused kernel lands ~1.3-2.0 ms vs the measured
3.23 ms, i.e. int8 serving ~9.6k → ~10.5-11k fps).

Usage (real TPU): python benchmarks/stem_pallas_probe.py [--batch 32]
Steps: compile+run the pallas path, bit-compare vs XLA, then time both
via serialized scan chains (bench.py regime). On success, flip
stems_s2d_q8's use_pallas default and re-run benchmarks/quant_bench.py.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.utils import enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image", type=int, default=256)
    args = ap.parse_args()

    enable_compile_cache()
    print(jax.devices())

    B, H, W = args.batch, args.image, args.image
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))

    qpacks, scales = [], []
    for e in range(4):
        w = rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.05
        b = rng.normal(size=(64,)).astype(np.float32) * 0.01
        qpacks.append({"conv1": {"w": w, "b": b}})
        scales.append({"layer1_0/conv1": 2.5 + 0.3 * e})

    from automoe_tpu.serving.quant import stems_s2d_q8

    f_xla = jax.jit(lambda xx: [t[0] for t in stems_s2d_q8(
        qpacks, scales, xx, use_pallas=False)])
    f_pal = jax.jit(lambda xx: [t[0] for t in stems_s2d_q8(
        qpacks, scales, xx, use_pallas=True)])
    f_pool = jax.jit(lambda xx: [t[0] for t in stems_s2d_q8(
        qpacks, scales, xx, use_pallas="pool")])

    print("compiling XLA path ...", flush=True)
    ref = f_xla(x)
    jax.block_until_ready(ref)
    print("compiling POOL-KERNEL path ...", flush=True)
    out_pool = f_pool(x)
    jax.block_until_ready(out_pool)
    for i, (a, b2) in enumerate(zip(ref, out_pool)):
        a, b2 = np.asarray(a, np.int32), np.asarray(b2, np.int32)
        d = np.abs(a - b2)
        neq, dmax = int((d != 0).sum()), int(d.max())
        print(f"pool kernel, expert {i}: mismatches {neq} / {a.size} "
              f"(max |d| {dmax})")
        # interpret mode is bit-exact (same int8 in, exact max), but on
        # chip the two PROGRAMS disagree by one step on ~6% of elements:
        # --xla_allow_excess_precision lets XLA keep h in f32 through
        # the fused conv->quant in one schedule and round it to bf16 in
        # the other, so the quantize sees different h ulps. Both are
        # valid quantizations; +-1 stem-activation steps are far inside
        # the PTQ noise floor (task-metric fidelity in BENCHMARKS.md).
        assert dmax <= 1 and neq / a.size < 0.10, f"pool expert {i}"
    print("pool kernel EXACT to +-1 quant step on chip")

    print("compiling FUSED PALLAS path ...", flush=True)
    t0 = time.time()
    out = f_pal(x)
    jax.block_until_ready(out)
    print(f"pallas compiled+ran in {time.time() - t0:.1f}s", flush=True)

    for i, (a, b2) in enumerate(zip(ref, out)):
        a, b2 = np.asarray(a, np.int32), np.asarray(b2, np.int32)
        d = np.abs(a - b2)
        neq, dmax = int((d != 0).sum()), int(d.max())
        print(f"expert {i}: shape {a.shape} mismatches {neq} / {a.size} "
              f"(max |d| {dmax})")
        # on-chip the conv reduction order differs between the pallas
        # im2col matmul and XLA's conv lowering, so values landing
        # exactly on a quantization boundary flip by one step — rare,
        # +-1, and within the PTQ noise floor (interpret mode, where the
        # arithmetic matches, is pinned bit-exact in tests).
        assert dmax <= 1 and neq / a.size < 1e-4, f"expert {i} mismatch"
    print("fused kernel EXACT to +-1 quant step (round-boundary fp noise)")

    def chain_time(f, x0, k_lo=3, k_hi=9, reps=3):
        """serialized scan: every output folds into the next carry so
        nothing hoists; differencing two lengths cancels dispatch."""
        def once(k):
            def body(c, _):
                outs = f(c)
                s = sum(jnp.sum(o.astype(jnp.int32)) for o in outs)
                return c + (s.astype(c.dtype) * 1e-12), ()

            g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
            r = g(x0)
            jax.block_until_ready(r)  # compile
            best = 1e9
            for _ in range(reps):
                t1 = time.time()
                r = g(x0)
                _ = np.asarray(jnp.sum(r))
                best = min(best, time.time() - t1)
            return best

        tl, th = once(k_lo), once(k_hi)
        return (th - tl) / (k_hi - k_lo)

    ms_x = chain_time(f_xla, x) * 1e3
    ms_q = chain_time(f_pool, x) * 1e3
    ms_p = chain_time(f_pal, x) * 1e3
    print(f"B={B}: XLA stems {ms_x:.2f} ms | XLA conv + pallas pool "
          f"{ms_q:.2f} ms ({ms_x / max(ms_q, 1e-9):.2f}x) | pallas fused "
          f"{ms_p:.2f} ms ({ms_x / max(ms_p, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
