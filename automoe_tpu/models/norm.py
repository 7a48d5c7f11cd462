"""BatchNorm with torch running-statistics semantics.

flax's `nn.BatchNorm` stores the BIASED batch variance in its running
stats; torch's `nn.BatchNorm2d` normalizes with the biased variance but
accumulates the UNBIASED one (Bessel n/(n-1) correction) into
`running_var`. The reference trains entirely with torch BN (ResNet
backbones, PointNet, EasyBackbone — e.g. reference
models/experts/nuscenes_expert.py:17-21, models/policy/
trajectory_head.py:10-23), so checkpoints our trainer writes must carry
torch-convention running stats to be eval-equivalent and round-trippable
through ckpt/torch_export.py. The N-step trajectory-parity tests
(tests/test_torch_train_parity.py) pin this.

Normalization math mirrors flax's (stats in float32, fast variance
E[x²]−E[x]², promote-to-dtype before the affine) so the forward parity
tests' tolerances are unaffected.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """Drop-in for `nn.BatchNorm(use_running_average, momentum, epsilon,
    dtype)` with torch-convention (unbiased) running-variance updates.

    Variable layout is identical to flax BatchNorm: params {scale, bias},
    batch_stats {mean, var} — importers/exporters and the EP batch-stat
    delta reduction see no difference.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            # fast variance (flax default): E[x²] − E[x]² — biased; used
            # for the normalization, exactly like torch train mode
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0
            )
            if not self.is_initializing():
                # under GSPMD the batch axis is a sharded dim of ONE
                # logical array, so x.size is the GLOBAL count (sync-BN
                # semantics, pinned in docs/DESIGN.md) and XLA inserts the
                # cross-device reduction for the means above
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased

        dtype = self.dtype or x.dtype
        xc, mean, var, scale_c, bias_c = (
            a.astype(dtype) for a in (x, mean, var, scale, bias)
        )
        mul = jax.lax.rsqrt(var + jnp.asarray(self.epsilon, dtype)) * scale_c
        return (xc - mean) * mul + bias_c
