"""Expert-output → uniform [B, output_dim] feature extractors for gating.

Parity with reference models/experts/expert_extractors.py:20-156: dense
maps are globally average-pooled then pushed through Linear(→512)-ReLU-
Dropout(0.1)-Linear(→out)-LayerNorm; nuScenes query outputs are flattened
to [B, Q*(C+bbox_dim)] first.

Every extractor splits as (parameter-free pool/flatten) → (trainable MLP
head). The `pooled=` kwarg feeds the head directly, skipping the pool —
the hook the frozen-expert feature cache uses to train gating without
re-running the expert trunks (train/feature_cache.py). Parameter
structure is identical either way.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _pool(x: jnp.ndarray, uv: Optional[Tuple[np.ndarray, np.ndarray]]):
    """Plain GAP, or exact mean-of-resize pooling over low-res logits
    (ops.resize.mean_of_resize_weights) when uv is given."""
    if uv is None:
        return jnp.mean(x, axis=(1, 2))
    u, v = uv
    return jnp.einsum("h,bhwc,w->bc", jnp.asarray(u, x.dtype), x,
                      jnp.asarray(v, x.dtype))


class _MLPHead(nn.Module):
    in_desc: str
    output_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


class DetectionExpertExtractor(nn.Module):
    """GAP(concat(class_logits, bbox_deltas)) → MLP → [B, output_dim]."""

    output_dim: int = 256
    num_classes: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, expert_output, *, deterministic: bool = True,
        pooled: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if pooled is None:
            combined = jnp.concatenate(
                [expert_output["class_logits"], expert_output["bbox_deltas"]],
                axis=-1,
            )  # [B,H,W,C+4]
            pooled = jnp.mean(combined, axis=(1, 2))  # [B,C+4]
        return _MLPHead(
            "det", self.output_dim, self.dtype, name="head"
        )(pooled, deterministic=deterministic)


class SegmentationExpertExtractor(nn.Module):
    output_dim: int = 256
    num_classes: int = 19
    dtype: Dtype = jnp.float32
    pool_uv: Optional[Tuple] = None  # exact low-res pooling (serving)

    @nn.compact
    def __call__(self, expert_output, *, deterministic: bool = True,
                 pooled: Optional[jnp.ndarray] = None):
        if pooled is None:
            pooled = _pool(expert_output, self.pool_uv)  # [B,num_classes]
        return _MLPHead(
            "seg", self.output_dim, self.dtype, name="head"
        )(pooled, deterministic=deterministic)


class DrivableExpertExtractor(nn.Module):
    output_dim: int = 256
    num_classes: int = 3
    dtype: Dtype = jnp.float32
    pool_uv: Optional[Tuple] = None

    @nn.compact
    def __call__(self, expert_output, *, deterministic: bool = True,
                 pooled: Optional[jnp.ndarray] = None):
        if pooled is None:
            pooled = _pool(expert_output, self.pool_uv)
        return _MLPHead(
            "drv", self.output_dim, self.dtype, name="head"
        )(pooled, deterministic=deterministic)


class NuScenesExpertExtractor(nn.Module):
    output_dim: int = 256
    num_queries: int = 100
    num_classes: int = 10
    bbox_dim: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, expert_output, *, deterministic: bool = True,
        pooled: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if pooled is None:
            combined = jnp.concatenate(
                [expert_output["class_logits"], expert_output["bbox_preds"]],
                axis=-1,
            )  # [B,Q,C+bbox]
            pooled = combined.reshape(combined.shape[0], -1)
        return _MLPHead(
            "nusc", self.output_dim, self.dtype, name="head"
        )(pooled, deterministic=deterministic)


ExtractorOutput = Union[jnp.ndarray, Dict[str, jnp.ndarray]]


def make_extractor(expert_config, dtype=jnp.float32, name=None, pool_uv=None) -> nn.Module:
    """Factory mirroring reference create_expert_extractors
    (models/experts/expert_extractors.py:159-201)."""
    t = expert_config.type
    if t == "detection":
        return DetectionExpertExtractor(
            expert_config.output_dim, expert_config.num_classes, dtype, name=name
        )
    if t == "segmentation":
        return SegmentationExpertExtractor(
            expert_config.output_dim, expert_config.num_classes, dtype,
            pool_uv=pool_uv, name=name,
        )
    if t == "drivable":
        return DrivableExpertExtractor(
            expert_config.output_dim, expert_config.num_classes, dtype,
            pool_uv=pool_uv, name=name,
        )
    if t == "nuscenes":
        return NuScenesExpertExtractor(
            expert_config.output_dim,
            expert_config.num_queries,
            expert_config.num_classes,
            expert_config.bbox_dim,
            dtype,
            name=name,
        )
    raise ValueError(f"Unknown expert type: {t}")
