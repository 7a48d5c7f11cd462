"""Post-training int8 quantization for the serving path.

The headline inference step is ResNet-conv bound (~95% of the 19 ms
B=128 step, benchmarks/BENCHMARKS.md) and the v5e MXU runs int8 matmuls
at 2x the bf16 rate (394 vs 197 TOPS; measured 2.4x on a representative
3x3 conv). This module converts the four expert trunks to int8 serving
form, a transform the reference (fp32 CUDA, inference/run_automoe.py)
has no counterpart for:

  * BatchNorm is FOLDED into the preceding conv (exact at inference —
    BN is affine given running stats), leaving conv + bias + relu;
  * weights are int8 with PER-OUTPUT-CHANNEL scales (symmetric);
  * activations are int8 with per-tensor scales from abs-max calibration
    over sample batches;
  * convs accumulate in int32 on the MXU and dequantize into the bf16
    epilogue (bias/relu/residual adds stay bf16).

Heads, extractors, gating, and policy stay bf16 — they are <5% of the
step. Training is untouched: quantization is a pure serving-time
transform of trained (or imported) AutoMoE variables, mirroring how
`models/fused_experts.py` treats fusion.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# (conv name, bn name) pairs in execution order; the graph itself lives in
# _resnet_graph. Mirrors models/resnet.py::ResNet18Backbone exactly.
_STAGES = [(1, 64, 1), (2, 128, 2), (3, 256, 2), (4, 512, 2)]


def _bn_affine(bn_params: Dict, bn_stats: Dict, eps: float = 1e-5):
    inv = 1.0 / np.sqrt(np.asarray(bn_stats["var"], np.float64) + eps)
    g = np.asarray(bn_params["scale"], np.float64) * inv
    b = np.asarray(bn_params["bias"], np.float64) - np.asarray(
        bn_stats["mean"], np.float64
    ) * g
    return g, b


def fold_resnet(params: Dict, batch_stats: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    """Fold every BatchNorm of a ResNet18Backbone into its preceding conv.

    Returns {conv_name: {"w": [H,W,I,O] f32, "b": [O] f32}} with names
    'conv1', 'layer{s}_{b}/conv1|conv2|downsample_conv'.
    """

    def fold(conv_p, bn_p, bn_s):
        g, b = _bn_affine(bn_p, bn_s)
        w = np.asarray(conv_p["kernel"], np.float64) * g  # scale out channels
        return {"w": w.astype(np.float32), "b": b.astype(np.float32)}

    out = {"conv1": fold(params["conv1"], params["bn1"], batch_stats["bn1"])}
    for stage, _, _ in _STAGES:
        for blk in (0, 1):
            n = f"layer{stage}_{blk}"
            p, s = params[n], batch_stats[n]
            out[f"{n}/conv1"] = fold(p["conv1"], p["bn1"], s["bn1"])
            out[f"{n}/conv2"] = fold(p["conv2"], p["bn2"], s["bn2"])
            if "downsample_conv" in p:
                out[f"{n}/downsample_conv"] = fold(
                    p["downsample_conv"], p["downsample_bn"], s["downsample_bn"]
                )
    return out


#: convs kept in float by default: the C=3 7x7 stem gains nothing from
#: int8 (padding-dominated, quantize overhead on the biggest activation)
#: and is the most accuracy-sensitive layer — keeping it float measured
#: FASTER (2.90 vs 3.30 ms/trunk at B=128) and tighter.
DEFAULT_FLOAT_CONVS = frozenset({"conv1"})


def quantize_folded(
    folded: Dict, float_convs: frozenset = DEFAULT_FLOAT_CONVS
) -> Dict[str, Dict[str, np.ndarray]]:
    """int8 symmetric per-output-channel weights from a folded tree;
    convs named in `float_convs` keep their folded float weights."""
    q = {}
    for name, p in folded.items():
        if name in float_convs:
            q[name] = {"w": p["w"], "b": p["b"]}
            continue
        w = p["w"]
        amax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12)  # [O]
        sw = (amax / 127.0).astype(np.float32)
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        q[name] = {"wq": wq, "sw": sw, "b": p["b"]}
    return q


def _resnet_graph(conv: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Shared ResNet-18 trunk graph over an abstract conv(name, x, stride,
    pad) -> y (bias already added). Mirrors models/resnet.py."""
    x = jax.nn.relu(conv("conv1", x, 2, 3))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for stage, filters, stride in _STAGES:
        for blk in (0, 1):
            n = f"layer{stage}_{blk}"
            s = stride if blk == 0 else 1
            y = jax.nn.relu(conv(f"{n}/conv1", x, s, 1))
            y = conv(f"{n}/conv2", y, 1, 1)
            if x.shape[-1] != filters or s != 1:
                r = conv(f"{n}/downsample_conv", x, s, 0)
            else:
                r = x
            x = jax.nn.relu(y + r)
    return x


def _conv(x, w, stride, pad, preferred=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn, preferred_element_type=preferred,
    )


def _conv_head(hp: Dict, feats: jnp.ndarray, dtype) -> jnp.ndarray:
    """The _ConvHead forward (models/experts.py): relu(3x3 pad1) -> 1x1,
    over bf16 flax head/decoder params — ONE implementation shared by the
    per-expert eval path and the full serving forward so the head math
    cannot drift from the module it mirrors."""
    h = jax.nn.relu(
        _conv(feats, jnp.asarray(hp["conv1"]["kernel"], dtype), 1, 1)
        + jnp.asarray(hp["conv1"]["bias"], dtype)
    )
    return _conv(h, jnp.asarray(hp["conv2"]["kernel"], dtype), 1, 0) \
        + jnp.asarray(hp["conv2"]["bias"], dtype)


def resnet_float_forward(folded: Dict, x: jnp.ndarray, dtype=jnp.float32,
                         collect: Optional[Dict] = None) -> jnp.ndarray:
    """BN-folded float trunk (== ResNet18Backbone.apply in eval mode).
    With `collect`, records each conv input's abs-max into it (traced
    values — return them from the surrounding jit)."""

    def conv(name, x, stride, pad):
        if collect is not None:
            collect[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        w = jnp.asarray(folded[name]["w"], dtype)
        b = jnp.asarray(folded[name]["b"], dtype)
        return _conv(x.astype(dtype), w, stride, pad) + b

    return _resnet_graph(conv, x.astype(dtype))


def resnet_quant_forward(qpack: Dict, scales: Dict[str, float], x: jnp.ndarray,
                         dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 trunk: per-tensor activation quant (calibrated scales) +
    per-channel weight quant; int32 MXU accumulation; bf16 epilogue."""

    def conv(name, x, stride, pad):
        p = qpack[name]
        if "wq" not in p:  # float conv (e.g. the C=3 stem)
            return (
                _conv(x.astype(dtype), jnp.asarray(p["w"], dtype), stride, pad)
                + jnp.asarray(p["b"], dtype)
            )
        # activation scales are HOST floats (compile-time constants);
        # weights may be traced jit arguments or numpy literals
        sx = float(max(scales[name], 1e-12)) / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * np.float32(1.0 / sx)), -127, 127
        ).astype(jnp.int8)
        y = _conv(xq, jnp.asarray(p["wq"]), stride, pad, preferred=jnp.int32)
        scale = jnp.asarray(p["sw"], jnp.float32) * np.float32(sx)  # [O]
        return (
            y.astype(jnp.float32) * scale + jnp.asarray(p["b"], jnp.float32)
        ).astype(dtype)

    return _resnet_graph(conv, x)


def fused_stems_q8(qpacks: Sequence[Dict], scales: Sequence[Dict[str, float]],
                   x: jnp.ndarray, dtype=jnp.bfloat16):
    """Run all E experts' float stems as ONE dense conv and hand back each
    expert's int8 trunk entry.

    Every expert consumes the same 3-channel image; a per-expert stem is
    a [7,7,3,64] conv whose 64 output channels half-fill the MXU's lane
    dimension and whose C_in=3 maps poorly onto the 128-deep systolic
    array — measured 1.09 ms of each 3.2 ms int8 trunk at B=128 (34%,
    benchmarks/quant_stage_bench.py). Concatenating the E kernels along
    the output-channel axis gives one [7,7,3,64E] conv (dense, NOT
    grouped — exact by construction), one maxpool, and one per-channel
    quantize, amortizing the image reads and filling the lanes.

    Returns [(xq_int8 [B,h,w,64], si_scale), ...] per expert, matching
    resnet_quant_forward_q8's `stem_in` contract.
    """
    ws, bs, sis = [], [], []
    for q, s in zip(qpacks, scales):
        p = q["conv1"]
        if "wq" in p:
            raise NotImplementedError("fused stem expects float stems")
        ws.append(jnp.asarray(p["w"], dtype))
        bs.append(jnp.asarray(p["b"], dtype))
        sis.append(np.float32(float(max(s["layer1_0/conv1"], 1e-12)) / 127.0))
    E, C = len(ws), ws[0].shape[-1]
    h = _conv(x.astype(dtype), jnp.concatenate(ws, axis=-1), 2, 3) + \
        jnp.concatenate(bs)
    h = jax.lax.reduce_window(
        jax.nn.relu(h), -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    # one quantize pass with a per-channel scale vector (constant within
    # each expert's 64-channel block), then cheap int8 slices
    inv = np.repeat(np.asarray([1.0 / s for s in sis], np.float32), C)
    hq = jnp.clip(
        jnp.round(h.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    return [(hq[..., i * C:(i + 1) * C], sis[i]) for i in range(E)]


def _s2d_stem_kernel(w: np.ndarray) -> np.ndarray:
    """Rewrite a [7,7,C,O] stride-2 pad-3 stem kernel into the exactly
    equivalent [4,4,4C,O] stride-1 VALID kernel over a 2x2 space-to-depth
    input padded (4,4): zero-pad 7->8 (shift by one so pad-3 becomes
    pad-4), then block-reshape so channel = di*2C + dj*C + c matches the
    s2d layout produced by stems_s2d_q8."""
    w = jnp.asarray(w)  # may be a traced jit argument (engine path)
    C, O = w.shape[2], w.shape[3]
    w8 = jnp.zeros((8, 8, C, O), w.dtype).at[1:8, 1:8].set(w)
    k = w8.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(4, 4, 4 * C, O)


def stems_s2d_q8(qpacks: Sequence[Dict], scales: Sequence[Dict[str, float]],
                 x: jnp.ndarray, dtype=jnp.bfloat16,
                 use_pallas=None):
    """All E float stems as ONE space-to-depth conv with int8 output
    BEFORE the maxpool.

    Two measured facts drive this (benchmarks/quant_stage_bench.py,
    B=128/256²): (1) the per-expert stem is ~1.0 ms of each 3.2 ms int8
    trunk and is BANDWIDTH-bound — the [B,128,128,64] bf16 conv output is
    materialized (268 MB), re-read by the maxpool, and only then shrunk;
    (2) plain output-channel fusion of the four stems (fused_stems_q8)
    does NOT help (4.36 ms vs 3.86 ms separate) because it moves the same
    bytes. This variant attacks both walls:

      * 2x2 space-to-depth turns the 7x7/s2 C_in=3 conv (reduction depth
        49*3=147, poorly tiled) into a 4x4/s1 C_in=12 conv with reduction
        depth 192 and — fused across E=4 experts — 256 output lanes, a
        clean MXU mapping. Exact by kernel rewrite (_s2d_stem_kernel).
      * the conv epilogue quantizes to int8 BEFORE the maxpool: round/
        clip/cast are monotone non-decreasing, so max(quant(x)) ==
        quant(max(x)) elementwise-exactly, and the pooled tensor the q8
        trunk wants is bit-identical while the conv->pool round trip
        crosses HBM at 1 byte/elem instead of 2.

    Returns [(xq int8 [B,H/4,W/4,64], si), ...] per expert — the same
    `stem_in` contract as fused_stems_q8.
    """
    ws, bs, sis = [], [], []
    for q, s in zip(qpacks, scales):
        p = q["conv1"]
        if "wq" in p:
            raise NotImplementedError("s2d stem expects float stems")
        ws.append(_s2d_stem_kernel(jnp.asarray(p["w"], dtype)))
        bs.append(jnp.asarray(p["b"], dtype))
        sis.append(np.float32(float(max(s["layer1_0/conv1"], 1e-12)) / 127.0))
    E, C = len(ws), ws[0].shape[-1]
    B, H, W, Cin = x.shape
    # pad (4,4) then 2x2 space-to-depth -> [B, (H+8)/2, (W+8)/2, 4*Cin]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (4, 4), (4, 4), (0, 0)))
    xs = xp.reshape(B, (H + 8) // 2, 2, (W + 8) // 2, 2, Cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (H + 8) // 2, (W + 8) // 2, 4 * Cin
    )
    k = jnp.concatenate(ws, axis=-1)  # [4,4,12,64E]
    inv = np.repeat(np.asarray([1.0 / s for s in sis], np.float32), C)
    # use_pallas: None/False = pure XLA (the measured best on this
    # toolchain), "pool" = XLA conv+quant with the Pallas maxpool
    # (ops/pallas_stem.py::maxpool3x3s2_int8), True = the fully fused
    # conv+quant+pool kernel. Both Pallas variants lower AND run on
    # this runtime's Mosaic since r3 — but both measure SLOWER than
    # XLA (B=32 stems: XLA 1.41 ms, conv+pallas-pool 4.53, fused 4.34;
    # the pool's sublane-pair unpack and the fused kernel's 16 im2col
    # tap stores are relayout-bound on the VPU), so XLA's int8
    # reduce_window — itself 3.5x over the HBM roofline — remains the
    # best available lowering. Full ceiling analysis in
    # benchmarks/BENCHMARKS.md; the kernels stay as measured,
    # exactness-pinned starting points for future toolchains.
    if use_pallas is None:
        use_pallas = False
    if use_pallas is True:
        from automoe_tpu.ops.pallas_stem import s2d_stem_pool_int8

        bias = jnp.concatenate(bs).astype(jnp.float32)
        hq = s2d_stem_pool_int8(xs, k, bias, jnp.asarray(inv))
        return [(hq[..., i * C:(i + 1) * C], sis[i]) for i in range(E)]
    dn = jax.lax.conv_dimension_numbers(xs.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        xs, k, (1, 1), "VALID", dimension_numbers=dn
    )[:, : H // 2, : W // 2]
    h = jax.nn.relu(h + jnp.concatenate(bs))
    # quantize in the conv epilogue (per-channel scale vector, constant
    # within each expert's block), THEN maxpool in int8
    hq = jnp.clip(
        jnp.round(h.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    if use_pallas == "pool":
        from automoe_tpu.ops.pallas_stem import maxpool3x3s2_int8

        hq = maxpool3x3s2_int8(hq)
    else:
        hq = jax.lax.reduce_window(
            hq, np.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
    return [(hq[..., i * C:(i + 1) * C], sis[i]) for i in range(E)]


def resnet_quant_forward_q8(qpack: Dict, scales: Dict[str, float],
                            x: jnp.ndarray, dtype=jnp.bfloat16,
                            stem_in=None) -> jnp.ndarray:
    """int8-RESIDENT trunk: requantization is folded into each conv's
    dequant epilogue, so activations cross HBM as int8 only.

    The v1 path round-trips every activation through bf16 (conv epilogue
    writes bf16, the next conv's quantize kernel reads bf16 and writes
    int8 — ~5 bytes/element of HBM traffic per boundary); TPU convs don't
    fuse with producers, so that traffic is real. Here each fused
    elementwise kernel goes int32 → (scale·x + b, relu, residual add) →
    int8 directly (~2 bytes/element), and the identity residual is
    DEQUANTIZED from the block's int8 input instead of keeping a float
    copy alive. Numerics: conv2's input is now quantized from fp32
    (slightly better than v1's bf16), the residual carries one extra
    quantization (slightly worse); fidelity bounds in tests/test_quant.py
    cover both paths.
    """
    def sx(name: str) -> np.float32:
        return np.float32(float(max(scales[name], 1e-12)) / 127.0)

    def quant(v_f32, s):
        return jnp.clip(
            jnp.round(v_f32 * np.float32(1.0 / s)), -127, 127
        ).astype(jnp.int8)

    def deq(y_i32, p, s_in):
        return (
            y_i32.astype(jnp.float32)
            * (jnp.asarray(p["sw"], jnp.float32) * s_in)
            + jnp.asarray(p["b"], jnp.float32)
        )

    if stem_in is not None:
        # stem already computed (fused across experts — fused_stems_q8)
        xq, si = stem_in
    else:
        p = qpack["conv1"]
        if "wq" in p:
            raise NotImplementedError("q8 trunk keeps the stem float "
                                      "(measured faster + tighter, see ledger)")
        # float stem (bf16) + maxpool, then enter the int8 domain once
        h = _conv(x.astype(dtype), jnp.asarray(p["w"], dtype), 2, 3) + \
            jnp.asarray(p["b"], dtype)
        h = jax.lax.reduce_window(
            jax.nn.relu(h), -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        si = sx("layer1_0/conv1")
        xq = quant(h.astype(jnp.float32), si)

    for stage, filters, stride in _STAGES:
        for blk in (0, 1):
            n = f"layer{stage}_{blk}"
            s = stride if blk == 0 else 1
            p1, p2 = qpack[f"{n}/conv1"], qpack[f"{n}/conv2"]
            s2 = sx(f"{n}/conv2")
            y1 = _conv(xq, jnp.asarray(p1["wq"]), s, 1, preferred=jnp.int32)
            hq = quant(jax.nn.relu(deq(y1, p1, si)), s2)
            y2 = _conv(hq, jnp.asarray(p2["wq"]), 1, 1, preferred=jnp.int32)
            a2 = deq(y2, p2, s2)
            if f"{n}/downsample_conv" in qpack:
                pd = qpack[f"{n}/downsample_conv"]
                rd = _conv(xq, jnp.asarray(pd["wq"]), s, 0,
                           preferred=jnp.int32)
                # the downsample shares conv1's int8 input tensor, so its
                # dequant uses si (its own calibrated scale is ~equal)
                r = deq(rd, pd, si)
            else:
                r = xq.astype(jnp.float32) * si
            out = jax.nn.relu(a2 + r)
            if stage == 4 and blk == 1:  # last block → heads want bf16
                return out.astype(dtype)
            nxt = (f"layer{stage}_1/conv1" if blk == 0
                   else f"layer{stage + 1}_0/conv1")
            si = sx(nxt)
            xq = quant(out, si)
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# AutoMoE-level assembly
# ---------------------------------------------------------------------------

def _expert_backbone_name(ecfg) -> str:
    return "image_backbone" if ecfg.type == "nuscenes" else "backbone"


def _dense(p, x):
    return x @ jnp.asarray(p["kernel"], x.dtype) + jnp.asarray(p["bias"], x.dtype)


def _fold_experts(variables, cfg) -> List[Dict]:
    return [
        fold_resnet(
            variables["params"][f"expert_{i}"][_expert_backbone_name(ecfg)],
            variables["batch_stats"][f"expert_{i}"][_expert_backbone_name(ecfg)],
        )
        for i, ecfg in enumerate(cfg.experts)
    ]


def calibrate_automoe(variables, config, batches: Sequence[Dict],
                      dtype=jnp.bfloat16,
                      folded: Optional[List[Dict]] = None
                      ) -> List[Dict[str, float]]:
    """Per-expert per-conv activation abs-max over calibration batches.

    `batches` are AutoMoE input dicts (only 'image' is consumed; images
    must already be preprocessed/normalized like training inputs).
    """
    from automoe_tpu.configs import load_model_config

    cfg = load_model_config(config)
    if folded is None:
        folded = _fold_experts(variables, cfg)

    @jax.jit
    def amaxes(image):
        out = []
        for f in folded:
            c: Dict[str, jnp.ndarray] = {}
            resnet_float_forward(f, image, dtype=dtype, collect=c)
            out.append(c)
        return out

    acc: List[Dict[str, float]] = [dict() for _ in folded]
    for batch in batches:
        per_expert = amaxes(jnp.asarray(batch["image"], dtype))
        for i, c in enumerate(per_expert):
            for k, v in c.items():
                acc[i][k] = max(acc[i].get(k, 0.0), float(v))
    return acc


def quantize_automoe(variables, config, calib_batches: Sequence[Dict],
                     dtype=jnp.bfloat16,
                     float_convs: frozenset = DEFAULT_FLOAT_CONVS
                     ) -> Dict[str, Any]:
    """Build the int8 serving pack: folded+quantized trunk weights and
    calibrated activation scales per expert."""
    from automoe_tpu.configs import load_model_config

    cfg = load_model_config(config)
    folded = _fold_experts(variables, cfg)
    scales = calibrate_automoe(
        variables, cfg, calib_batches, dtype=dtype, folded=folded
    )
    experts = [quantize_folded(f, float_convs) for f in folded]
    return {"experts": experts, "scales": scales}


def quantize_expert(variables, calib_images: Sequence,
                    dtype=jnp.bfloat16,
                    float_convs: frozenset = DEFAULT_FLOAT_CONVS,
                    backbone: str = "backbone"):
    """(qpack, scales) for ONE standalone expert (BDD det/seg/drivable) —
    the per-expert counterpart of quantize_automoe, so the expert evals
    (evals/cli.py bdd --quantize) can measure int8 task-metric fidelity
    against the bf16 path (VERDICT r2 #5)."""
    folded = fold_resnet(
        variables["params"][backbone], variables["batch_stats"][backbone]
    )

    @jax.jit
    def amaxes(image):
        c: Dict[str, jnp.ndarray] = {}
        resnet_float_forward(folded, image, dtype=dtype, collect=c)
        return c

    scales: Dict[str, float] = {}
    for img in calib_images:
        c = amaxes(jnp.asarray(img, dtype))
        for k, v in c.items():
            scales[k] = max(scales.get(k, 0.0), float(v))
    return quantize_folded(folded, float_convs), scales


def make_expert_quant_apply(task: str, num_classes: int,
                            scales: Dict[str, float],
                            dtype=jnp.bfloat16, trunk: str = "q8"):
    """apply_fn(tree, image) with the SAME output contract as the bf16
    expert module (models/experts.py BDD heads), over an int8 trunk:
    detection -> {class_logits, bbox_deltas} on the dense grid; seg and
    drivable -> upsampled [B,H,W,C] logits. `tree` = {"q": qpack from
    quantize_expert, "params": the expert's flax params (head/decoder
    weights are read from it, bf16)} — both cross the jit boundary as
    arguments. Plugs straight into evaluate_detection/evaluate_seg_like.
    """
    trunk_fwd = {
        "q8": resnet_quant_forward_q8, "v1": resnet_quant_forward
    }[trunk]
    head_name = "head" if task == "detection" else "decoder"

    def apply_fn(tree, image):
        feats = trunk_fwd(tree["q"], scales, image.astype(dtype), dtype=dtype)
        out = _conv_head(tree["params"][head_name], feats, dtype)
        if task == "detection":
            return {
                "class_logits": out[..., :num_classes],
                "bbox_deltas": out[..., num_classes:],
            }
        from automoe_tpu.ops.resize import resize_bilinear

        return resize_bilinear(
            out, image.shape[1], image.shape[2], antialias=False
        )

    return apply_fn


def make_quant_forward(config, scales: List[Dict[str, float]],
                       dtype=jnp.bfloat16, trunk: str = "q8",
                       stem: str = "s2d"):
    """fn(variables, qexperts, batch) -> AutoMoE serving outputs with int8
    expert trunks (heads/gating/policy bf16, fast gating pool — the same
    regime as bench.py's serving model). A lidar-enabled nuScenes expert
    keeps its PointNet branch bf16 (it is tiny — the int8 win is in the
    image trunk) so models trained with the shipped nuscenes_v5e preset
    serve on this path too.

    `scales` (qpack["scales"]) are host floats baked in at trace time;
    `qexperts` (qpack["experts"]) is a pytree that can cross the jit
    boundary as arguments. `trunk` picks the int8 trunk implementation:
    'q8' (int8-resident, default) or 'v1' (bf16 round-trip between
    convs). `stem` picks the q8 stem strategy: 's2d' (all experts as one
    space-to-depth conv, int8 before the pool — the measured winner),
    'fused' (one dense 7x7 conv, ledgered negative result), or 'solo'
    (per-expert float stems)."""
    from automoe_tpu.configs import load_model_config
    from automoe_tpu.models.automoe import _last_step
    from automoe_tpu.models.context import make_context_extractor
    from automoe_tpu.models.extractors import make_extractor
    from automoe_tpu.models.gating import gating_network_from_config
    from automoe_tpu.models.policy import TrajectoryPolicy
    from automoe_tpu.ops.resize import mean_of_resize_weights

    cfg = load_model_config(config)
    trunk_fwd = {
        "q8": resnet_quant_forward_q8, "v1": resnet_quant_forward
    }[trunk]

    ctx_extractor = make_context_extractor(cfg.context, dtype)
    # deterministic routing for serving (noise zeroed)
    gating = gating_network_from_config(cfg, dtype, force_deterministic=True)
    policy = TrajectoryPolicy(
        horizon=cfg.policy.num_waypoints,
        context_dim=cfg.gating.processed_dim,
        backbone_dim=cfg.policy.backbone_dim,
        dtype=dtype,
    )

    def forward(variables, qexperts, batch):
        image = batch["image"].astype(dtype)
        B = image.shape[0]
        zeros = jnp.zeros((B, 1), dtype)
        params = variables["params"]

        ctx_vars = {"params": params["context_extractor"]}
        speed = _last_step(batch["speed"]) if "speed" in batch else zeros
        steering = _last_step(batch["steering"]) if "steering" in batch else zeros
        throttle = _last_step(batch["throttle"]) if "throttle" in batch else zeros
        brake = _last_step(batch["brake"]) if "brake" in batch else zeros
        if cfg.context.type == "simple":
            context_features = ctx_extractor.apply(
                ctx_vars, speed, steering, throttle, brake
            )
        else:  # 'full' takes one context_data dict (models/automoe.py:110-120)
            context_features = ctx_extractor.apply(ctx_vars, {
                "speed": speed, "steering": steering,
                "throttle": throttle, "brake": brake,
                "hour": batch.get("hour", zeros),
                "minute": batch.get("minute", zeros),
                "weather": batch.get("weather", {}),
                "road": batch.get("road", {}),
            })

        low_h, low_w = image.shape[1] // 32, image.shape[2] // 32
        pool_uv = mean_of_resize_weights(
            low_h, low_w, image.shape[1], image.shape[2], False
        )
        # q8: all experts' float stems run as one conv (exact; see
        # stems_s2d_q8), then each trunk continues from its int8 slice
        stem_fn = {"s2d": stems_s2d_q8, "fused": fused_stems_q8,
                   "solo": None}[stem]
        stems = (
            stem_fn(qexperts, scales, image, dtype=dtype)
            if trunk == "q8" and stem_fn is not None else None
        )
        expert_features = []
        for i, ecfg in enumerate(cfg.experts):
            if stems is not None:
                feats = resnet_quant_forward_q8(
                    qexperts[i], scales[i], image, dtype=dtype,
                    stem_in=stems[i],
                )
            else:
                feats = trunk_fwd(
                    qexperts[i], scales[i], image, dtype=dtype
                )  # [B, h, w, 512]
            ep = params[f"expert_{i}"]
            if ecfg.type == "detection":
                out = _conv_head(ep["head"], feats, dtype)
                expert_out = {
                    "class_logits": out[..., : ecfg.num_classes],
                    "bbox_deltas": out[..., ecfg.num_classes:],
                }
            elif ecfg.type in ("segmentation", "drivable"):
                expert_out = _conv_head(ep["decoder"], feats, dtype)
            else:  # nuscenes: int8 image trunk (+ bf16 PointNet if lidar)
                img_feat = jnp.mean(feats, axis=(1, 2))  # include_pool
                img_feat = _dense(ep["image_projection"], img_feat)
                if ecfg.use_lidar:
                    from automoe_tpu.models.experts import PointNet

                    # lidar absent from the batch (the engine's camera-only
                    # serving loop) → zero point cloud through the PointNet,
                    # matching the composite forward (models/automoe.py
                    # lidar-or-zeros, reference automoe.py:170-175). Skipping
                    # the branch instead diverges from the bf16 engine for
                    # fusion='add' and shape-errors for 'concat'.
                    lidar = batch.get("lidar")
                    if lidar is None:
                        lidar = jnp.zeros(
                            (img_feat.shape[0], 1000, 3), dtype
                        )
                    pnet = PointNet(
                        output_dim=256, use_tnet=ecfg.use_tnet, dtype=dtype
                    )
                    pvars = {"params": ep["lidar_backbone"]}
                    pstats = (
                        variables.get("batch_stats", {})
                        .get(f"expert_{i}", {})
                        .get("lidar_backbone")
                    )
                    if pstats:
                        pvars["batch_stats"] = pstats
                    lidar_feat = pnet.apply(
                        pvars, lidar.astype(dtype),
                        train=False, deterministic=True,
                    )
                    fused = (
                        jnp.concatenate([img_feat, lidar_feat], axis=-1)
                        if ecfg.fusion == "concat"
                        else img_feat + lidar_feat
                    )
                else:
                    fused = img_feat
                q = jnp.asarray(ep["query_embed"], dtype)
                x = fused[:, None, :] + q[None, :, :]
                x = jax.nn.relu(_dense(ep["decoder_fc1"], x))
                x = jax.nn.relu(_dense(ep["decoder_fc2"], x))
                expert_out = {
                    "class_logits": _dense(ep["class_head"], x),
                    "bbox_preds": _dense(ep["bbox_head"], x),
                }
            extractor = make_extractor(
                ecfg, dtype,
                pool_uv=(pool_uv if ecfg.type in ("segmentation", "drivable")
                         else None),
            )
            expert_features.append(
                extractor.apply({"params": params[f"extractor_{i}"]}, expert_out)
            )

        gating_out = gating.apply(
            {"params": params["gating_network"]},
            expert_features, context_features,
        )
        pvars = {"params": params["policy_head"]}
        if variables.get("batch_stats", {}).get("policy_head"):
            pvars["batch_stats"] = variables["batch_stats"]["policy_head"]
        policy_out = policy.apply(pvars, image, gating_out["combined_output"])
        speed_seq = policy_out["speed"]
        return {
            "waypoints": policy_out["waypoints"],
            "speed": speed_seq[:, -1:],
            "speed_seq": speed_seq,
            "expert_weights": gating_out["expert_weights"],
            "combined_features": gating_out["combined_output"],
            "gate_logits": gating_out["gate_logits"],
        }

    return forward
