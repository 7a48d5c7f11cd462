"""Fake-quantization ops for QAT (straight-through estimator).

Simulates the int8 serving grid (serving/quant.py) during training so a
QAT-fine-tuned model loses ~nothing when deployed through the PTQ path:

  * weights: symmetric per-OUTPUT-CHANNEL int8, scale = absmax/127 —
    the same grid `quantize_folded` uses on the BN-folded weights. The
    per-channel symmetric grid COMMUTES with BN folding: folding
    multiplies output channel o by c_o = gamma_o/sigma_o, and
    fq(c ⊙ W) = c ⊙ fq(W) exactly (absmax and the round grid both scale
    linearly per channel) — so the quantization the network trains
    against IS the quantization of its deployed folded weights
    (tests/test_qat.py pins the commutation).
  * activations: symmetric per-tensor int8 with a DYNAMIC (current
    batch) absmax scale — stateless, so TrainState is unchanged; the
    deployed path's calibrated static scales are drawn from the same
    distribution.

Both use the straight-through estimator: the forward value is the
dequantized grid point, the gradient passes through as identity
(`x + stop_gradient(q(x) - x)`), with clipped values still passing
gradient (vanilla STE, matching torch.fake_quantize defaults' value
semantics with per-channel symmetric qscheme).

The reference has no QAT (or any quantization) anywhere; its serving
story is fp16 autocast (/root/reference/inference/run_automoe.py:51).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _ste(x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-output-channel int8 fake-quant of a conv kernel
    [kh, kw, cin, cout] (or any array whose LAST axis is the output
    channel). Mirrors serving/quant.py::quantize_folded exactly:
    scale = max(absmax, 1e-12)/127, clip(round(w/s), -127, 127)."""
    wf = w.astype(jnp.float32)
    axes = tuple(range(w.ndim - 1))
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes), _EPS)
    s = jax.lax.stop_gradient(amax / 127.0)
    q = jnp.clip(jnp.round(wf / s), -127, 127) * s
    return _ste(wf, q).astype(w.dtype)


def fake_quant_act(x: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor int8 fake-quant of an activation with a
    dynamic absmax scale. Mirrors the serving quantize kernels
    (resnet_quant_forward*): scale = max(absmax, 1e-12)/127."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf)), _EPS)
    s = jax.lax.stop_gradient(amax / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127) * s
    return _ste(xf, q).astype(x.dtype)
