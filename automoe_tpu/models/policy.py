"""Trajectory policy head.

Parity with reference models/policy/trajectory_head.py:5-62: a small
4-stage strided CNN (EasyBackbone) → global pool → FC, then two 3-layer
MLP heads over [image_feat ∥ context] producing ego-frame waypoints
[B,H,2] and a speed profile [B,H].
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from automoe_tpu.models.norm import TorchBatchNorm
import jax.numpy as jnp

Dtype = Any


class EasyBackbone(nn.Module):
    out_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        norm = lambda name: TorchBatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        specs = [(32, 5, 2), (64, 3, 1), (128, 3, 1), (256, 3, 1)]
        for i, (ch, k, p) in enumerate(specs):
            x = nn.Conv(
                ch,
                (k, k),
                strides=(2, 2),
                padding=((p, p), (p, p)),
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(norm(f"bn{i}")(x))
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(x)


class _Head(nn.Module):
    out_features: int
    hidden: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc3")(x)


class TrajectoryPolicy(nn.Module):
    horizon: int = 8
    context_dim: int = 0
    backbone_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        feat = EasyBackbone(self.backbone_dim, self.dtype, name="backbone")(
            image, train=train
        )
        x = feat if context is None else jnp.concatenate([feat, context], axis=-1)
        wp = _Head(self.horizon * 2, dtype=self.dtype, name="head_wp")(x)
        spd = _Head(self.horizon, dtype=self.dtype, name="head_spd")(x)
        return {
            "waypoints": wp.reshape(-1, self.horizon, 2),
            "speed": spd.reshape(-1, self.horizon),
        }
