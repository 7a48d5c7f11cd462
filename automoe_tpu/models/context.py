"""Driving-context encoders.

Parity with reference models/context/context_features.py. The 'full'
extractor there declares 2 time input dims but produces 4 (sin/cos of hour
AND minute, context_features.py:24 vs :46) — a latent shape bug that would
crash its forward. We compute the input width from what is actually
produced (4) and note the divergence; the shipped config uses 'simple'.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class SimpleContextExtractor(nn.Module):
    """[speed, steering, throttle, brake] → Linear(4→32)-ReLU-Dropout(0.1)-
    Linear(32→context_dim)-LayerNorm. (reference context_features.py:137-165)"""

    context_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        speed: jnp.ndarray,
        steering: jnp.ndarray,
        throttle: jnp.ndarray,
        brake: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = jnp.concatenate([speed, steering, throttle, brake], axis=-1)  # [B,4]
        x = nn.Dense(32, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Dense(self.context_dim, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


class FullContextExtractor(nn.Module):
    """Vehicle state + weather (4) + cyclical time (4) + road (3) context.

    Reference ContextFeatureExtractor (context_features.py:6-134), with its
    declared-vs-produced time-dim mismatch fixed (4 features produced).
    """

    context_dim: int = 64
    include_weather: bool = True
    include_time: bool = True
    include_road: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, context_data: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> jnp.ndarray:
        speed = context_data["speed"]
        B = speed.shape[0]
        zeros = jnp.zeros((B, 1), speed.dtype)
        ones = jnp.ones((B, 1), speed.dtype)

        feats = [
            jnp.concatenate(
                [
                    speed,
                    context_data.get("steering", zeros),
                    context_data.get("throttle", zeros),
                    context_data.get("brake", zeros),
                ],
                axis=-1,
            )
        ]
        if self.include_weather:
            w = context_data.get("weather", {}) or {}
            feats.append(
                jnp.concatenate(
                    [
                        w.get("rain", zeros),
                        w.get("fog", zeros),
                        w.get("wetness", zeros),
                        w.get("sun_angle", zeros),
                    ],
                    axis=-1,
                )
            )
        if self.include_time:
            hour = context_data.get("hour", zeros)
            minute = context_data.get("minute", zeros)
            hour_rad = 2.0 * jnp.pi * hour / 24.0
            minute_rad = 2.0 * jnp.pi * minute / 60.0
            feats.append(
                jnp.concatenate(
                    [
                        jnp.sin(hour_rad),
                        jnp.cos(hour_rad),
                        jnp.sin(minute_rad),
                        jnp.cos(minute_rad),
                    ],
                    axis=-1,
                )
            )
        if self.include_road:
            r = context_data.get("road", {}) or {}
            feats.append(
                jnp.concatenate(
                    [
                        r.get("road_type", zeros),
                        r.get("lane_count", ones),
                        r.get("curvature", zeros),
                    ],
                    axis=-1,
                )
            )
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Dense(self.context_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Dense(self.context_dim, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


def make_context_extractor(context_config, dtype=jnp.float32, name=None) -> nn.Module:
    """Factory mirroring reference create_context_extractor
    (context_features.py:168-191)."""
    if context_config.type == "simple":
        return SimpleContextExtractor(context_config.context_dim, dtype, name=name)
    if context_config.type == "full":
        return FullContextExtractor(
            context_config.context_dim,
            context_config.include_weather,
            context_config.include_time,
            context_config.include_road,
            dtype,
            name=name,
        )
    raise ValueError(f"Unknown context extractor type: {context_config.type}")
