"""Pallas fused s2d-stem kernel: conv + quantize + maxpool in one pass.

The int8 serving path runs all four expert stems as ONE space-to-depth
conv (serving/quant.py::stems_s2d_q8): a 4x4/s1 C_in=12 conv over the
2x2-s2d image, quantized to int8 in the epilogue, then 3x3/s2 maxpool.
Measured on the v5e (benchmarks/quant_stage_bench.py --micro, B=128):

    s2d prep 0.16 ms | conv+quant 2.13 ms | int8 maxpool 2.78 ms

XLA fuses the quantize into the conv epilogue but must MATERIALIZE the
pre-pool [B,128,128,256] int8 tensor (537 MB) and re-read it for the
overlapping pool — >1 GB of HBM traffic for an op whose true inputs and
outputs are 53 MB + 134 MB. This kernel keeps each conv row-block in
VMEM, quantizes it there, pools it there, and only ever writes the
pooled [B,64,64,256] int8 output:

  * grid over the batch; per image, 8 row-chunks of 16 conv rows;
  * the whole [hc+4, wp, 12] s2d image (444 KB at 256²) rides into VMEM
    as the grid step's input block — pallas pipelines the copies across
    batch elements, and the BlockSpec auto-copy is the one HBM→VMEM
    path Mosaic accepts for a 12-lane minor dim (manual async DMA to
    such a destination is unimplemented — probe matrix in
    benchmarks/BENCHMARKS.md);
  * the 4x4x12 conv is an im2col matmul: 16 shifted [R,128,12] slices
    concatenated along lanes -> P [R*128, 192] @ W [192, 256] on the
    MXU with f32 accumulation (same contraction as the XLA conv);
  * bias + relu on the VPU in f32 (the XLA path's quantize reads the
    f32 conv accumulator under --xla_allow_excess_precision — a bf16
    round here costs 6-9% one-step flips, measured), then the 3x3/s2
    pool as static shifted slices max'd in f32, then per-channel
    round/clip/int8 on the POOLED tensor only (quantize commutes with
    max — monotone — so pool-then-quantize == the XLA path's
    quantize-then-pool; int8 max itself is un-lowerable on this Mosaic:
    arith.maxsi on packed vector<8x128x4xi8> fails to legalize);
    row/col -1 pads substitute 0, safe because relu'd values are >= 0;
    16-row chunks keep the f32 temporaries inside the 16 MB
    scoped-VMEM budget that binds under lax.scan/serving programs.

The reference has no counterpart (fp32 CUDA serving,
inference/run_automoe.py); this is the TPU-native serving fast path.

STATUS: exact in interpret mode (tests/test_pallas_stem.py pins it
against the XLA path bit-for-bit), but the Mosaic compiler shipped with
this runtime cannot lower the im2col assembly — DMA destinations must
have 128-multiple lane dims, which a [rows, cols, 12]-channel buffer
cannot satisfy, and every dense-lane repacking either inflates HBM
traffic ~10x or needs a strided sublane interleave Mosaic does not
implement (nine-probe capability matrix in benchmarks/BENCHMARKS.md).
stems_s2d_q8 therefore keeps the XLA path as its default and exposes
this kernel as opt-in (`use_pallas=True`) for future toolchains.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 16  # conv rows per chunk; H/2 must be a multiple. 16 (not 32)
# keeps the f32 per-chunk temporaries inside the 16 MB scoped-VMEM limit
# that applies when the kernel runs under lax.scan / the serving program
# (measured on-chip: 32-row f32 chunks exceeded it by ~1 MB).


def _pool_chunk(ck: jnp.ndarray) -> jnp.ndarray:
    """3x3/s2 maxpool of one conv chunk.

    ck: [_CHUNK+1, Wc, O] f32 — conv rows 2p0-1 .. 2p0+_CHUNK-1 (row 0
    is the "row -1" of the window; the caller passes zeros for the
    global edge). Returns [_CHUNK//2, Wc//2, O].

    Runs in f32 BEFORE quantization: this Mosaic cannot legalize
    `arith.maxsi` on packed int8 vregs (vector<8x128x4xi8> — probed on
    the real chip), and because the quant map round(h*inv) with inv>0
    is monotone, pool-then-quantize matches the XLA path's
    quantize-then-pool exactly while touching 4x fewer elements in the
    quant. f32 (not bf16) pooling is load-bearing for parity: with
    --xla_allow_excess_precision the XLA path's quantize reads the f32
    conv accumulator directly (the bf16 conversion is elided), so a
    bf16 round anywhere before the quantize flips 6-9% of outputs by
    one step (measured on-chip); in f32 the only residual is MXU
    reduction order, ~1e-6 of elements at +-1.
    """
    r, wc, o = ck.shape
    c = r - 1
    # columns: out q uses cols 2q-1, 2q, 2q+1
    a = ck.reshape(r, wc // 2, 2, o)
    a0, a1 = a[:, :, 0], a[:, :, 1]                      # cols 2q, 2q+1
    a1m = jnp.concatenate(                                # col 2q-1
        [jnp.zeros((r, 1, o), ck.dtype), a1[:, : wc // 2 - 1]], axis=1
    )
    colmax = jnp.maximum(jnp.maximum(a0, a1), a1m)        # [c+1, Wc/2, O]
    # rows: out p' uses local rows 2p', 2p'+1, 2p'+2
    b_ = colmax[0:c].reshape(c // 2, 2, wc // 2, o)
    b0, b1 = b_[:, 0], b_[:, 1]
    b2 = colmax[1:c + 1].reshape(c // 2, 2, wc // 2, o)[:, 1]
    return jnp.maximum(jnp.maximum(b0, b1), b2)           # [c/2, Wc/2, O]


def _stem_kernel(xs_ref, w_ref, bias_ref, inv_ref, out_ref, p_buf,
                 *, hc: int, wc: int, o: int):
    # xs_ref: [1, hc+4, wp, 12] VMEM block — one image's s2d input,
    # copied in (and pipelined across grid steps) by pallas itself. The
    # earlier revision DMA'd row-chunks by hand, but Mosaic cannot lower
    # a manual async copy whose destination has a 12-lane minor dim
    # (probe matrix in benchmarks/BENCHMARKS.md) while the BlockSpec
    # auto-copy of the same layout is legal — and it double-buffers
    # batch elements for free.
    n_chunks = hc // _CHUNK
    for t in range(n_chunks):  # static unroll: shapes differ at t=0
        # chunk t consumes conv rows Ct-1..Ct+C-1 -> xs rows Ct-1..Ct+C+2;
        # t=0 starts at row 0 (the missing row -1 is the zero edge row)
        start = max(0, _CHUNK * t - 1)
        r = _CHUNK if t == 0 else _CHUNK + 1
        # im2col: tap (a,b) of the 4x4 kernel, channels c packed last ->
        # lane index (a*4+b)*12+c matches w_ref's (a,b,c) row-major rows.
        # Staged through a scratch ref: a direct 16-way lane-concatenate
        # of slices with mixed sublane/lane offsets hits an unimplemented
        # Mosaic relayout; per-tap stores keep every layout canonical.
        for a in range(4):
            for b in range(4):
                k = a * 4 + b
                p_buf[0:r, :, 12 * k: 12 * (k + 1)] = (
                    xs_ref[0, start + a: start + a + r, b: b + wc, :]
                )
        acc = jnp.dot(
            p_buf[0:r].reshape(r * wc, 192),
            w_ref[:],
            preferred_element_type=jnp.float32,
        )
        # Bias + relu stay in f32 on the raw accumulator — matching the
        # XLA path, whose quantize reads the f32 conv accumulator under
        # --xla_allow_excess_precision (any bf16 round here flips 6-9%
        # of outputs by one quant step; measured on-chip).
        h = jnp.maximum(acc + bias_ref[0], 0.0)
        ck = h.reshape(r, wc, o)
        if t == 0:  # global row -1: zeros are neutral (values >= 0)
            ck = jnp.concatenate(
                [jnp.zeros((1, wc, o), h.dtype), ck], axis=0
            )
        pooled = _pool_chunk(ck)  # f32 [_CHUNK/2, wc/2, o]
        q = jnp.clip(jnp.round(pooled * inv_ref[0]), -127.0, 127.0)
        out_ref[0, pl.ds(_CHUNK // 2 * t, _CHUNK // 2)] = q.astype(jnp.int8)


def _pool_kernel(xq_ref, out_ref, *, h2: int, w2: int):
    # xq_ref: [1, h2, w2, 128] int8 — one image's pre-pool tensor, one
    # 128-lane channel slab (the slab grid keeps in+out+temps ~7 MB,
    # far inside the 16 MB scoped-VMEM limit). Max runs in f32: int8
    # max is un-lowerable on this Mosaic (arith.maxsi on packed i8
    # vregs), and quantized relu'd values are integers in [0,127], so
    # i8 -> f32 -> max -> i8 is exact.
    n_chunks = h2 // _CHUNK
    for t in range(n_chunks):  # static unroll: shapes differ at t=0
        start = max(0, _CHUNK * t - 1)
        r = _CHUNK if t == 0 else _CHUNK + 1
        ck = xq_ref[0, start: start + r].astype(jnp.float32)
        if t == 0:  # global row -1: zeros are neutral (values >= 0)
            ck = jnp.concatenate(
                [jnp.zeros((1, w2, 128), jnp.float32), ck], axis=0
            )
        pooled = _pool_chunk(ck)  # f32 [_CHUNK/2, w2/2, 128]
        out_ref[0, pl.ds(_CHUNK // 2 * t, _CHUNK // 2)] = (
            pooled.astype(jnp.int8)
        )


def maxpool3x3s2_int8(xq: jnp.ndarray, *, interpret: bool = False
                      ) -> jnp.ndarray:
    """3x3/s2 SAME maxpool of a non-negative int8 tensor, as a Pallas
    kernel: [B, H2, W2, O] int8 -> [B, H2/2, W2/2, O] int8.

    Exactly `reduce_window(max, (1,3,3,1), (1,2,2,1), pad 1)` for
    relu'd quantized inputs (values >= 0; the zero edge substitution is
    neutral). XLA's own int8 reduce_window lowering runs 3.5x over the
    HBM roofline on this toolchain (2.86 ms vs 0.82 at B=128/256² —
    benchmarks/BENCHMARKS.md); this kernel streams 128-channel slabs
    through VMEM and does the 9-point max as shifted slices in f32.
    """
    b_, h2, w2, o = xq.shape
    if h2 % _CHUNK or w2 % 2 or o % 128:
        raise ValueError(f"unsupported pool shape {(h2, w2, o)}")
    return pl.pallas_call(
        functools.partial(_pool_kernel, h2=h2, w2=w2),
        grid=(b_, o // 128),
        in_specs=[
            pl.BlockSpec(
                (1, h2, w2, 128), lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h2 // 2, w2 // 2, 128), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b_, h2 // 2, w2 // 2, o), jnp.int8
        ),
        cost_estimate=pl.CostEstimate(
            flops=b_ * h2 * w2 * o * 5,
            bytes_accessed=xq.size + xq.size // 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq)


def s2d_stem_pool_int8(xs: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                       inv: jnp.ndarray, *, interpret: bool = False
                       ) -> jnp.ndarray:
    """Fused stem: [B,Hc+4,Wc+4,12] s2d input -> pooled int8
    [B,Hc/2,Wc/2,O].

    xs  — s2d image, bf16/f32 (stems_s2d_q8 layout: pad 4, 2x2 blocks)
    w   — [4,4,12,O] s2d kernel (all experts concatenated along O)
    bias— [O] f32 folded-BN bias
    inv — [O] f32 per-channel quant multipliers (127/scale)
    """
    b_, hp, wp, cin = xs.shape
    assert cin == 12, cin
    hc, wc = hp - 4, wp - 4
    o = w.shape[-1]
    if hc % _CHUNK or wc % 2 or o % 128:
        raise ValueError(f"unsupported stem shape {(hc, wc, o)}")
    if wp % 8:  # Mosaic: sliced sublane dims must be 8-aligned
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, -wp % 8), (0, 0)))
        wp = xs.shape[2]
    wmat = w.reshape(192, o).astype(xs.dtype)
    kernel = functools.partial(_stem_kernel, hc=hc, wc=wc, o=o)
    flops = 2 * b_ * hc * wc * 192 * o
    return pl.pallas_call(
        kernel,
        grid=(b_,),
        in_specs=[
            # one image's s2d input per grid step, auto-copied to VMEM
            # (444 KB at 256²) and pipelined across steps by pallas
            pl.BlockSpec(
                (1, hc + 4, wp, cin), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias [1,O]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # inv [1,O]
        ],
        out_specs=pl.BlockSpec(
            (1, hc // 2, wc // 2, o), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_, hc // 2, wc // 2, o), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK + 1, wc, 192), xs.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xs.size * xs.dtype.itemsize
            + b_ * (hc // 2) * (wc // 2) * o,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, wmat, bias.reshape(1, o).astype(jnp.float32),
      inv.reshape(1, o).astype(jnp.float32))
