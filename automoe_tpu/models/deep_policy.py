"""Deep trajectory policy: a depth-scalable residual GroupNorm trunk the
pipeline-parallel path (parallel/pp.py) can split across chips.

The reference's policy backbone is 4 convs (models/policy/
trajectory_head.py:5-62 — reproduced as `models/policy.py::EasyBackbone`)
and fits any single chip; this model is the framework's growth path for
policy capacity: the same stem → trunk → pooled-head architecture, but
with `depth` IDENTICAL shape-preserving residual blocks whose parameters
are stacked on a leading [L] axis. That layout makes the trunk directly
consumable by
  * `pp.sequential_apply` (a `lax.scan` over blocks — the single-chip
    path, and the semantics reference for the pipeline), and
  * `pp.grouped_pipeline_apply` (L blocks folded into S = mesh 'model'
    stages of L/S blocks each, GPipe-microbatched over ICI).

TPU-native design constraints baked in:
  * GroupNorm, not BatchNorm — per-SAMPLE normalization keeps every
    block independent across the batch, which pipeline microbatching
    requires (pp.py constraint #2), and removes mutable batch_stats
    from the hot path;
  * trunk convs carry NO bias — a conv bias feeding a normalizer is
    (partially) in the normalizer's null space, so its gradient is fp
    noise that Adam amplifies into sharding-dependent drift (measured on
    BN in tests/test_feature_cache.py::test_cached_step_tp_equivalence);
    GroupNorm's own scale/bias provide the affine degrees of freedom;
  * blocks are einsum/conv + elementwise only — one fused XLA loop body
    under `lax.scan`, MXU-tileable at any width.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# module (and param-subtree) name marking the [L]-stacked trunk params;
# parallel/pp.py::pp_state_shardings places every leaf under a path
# containing this token on the 'model' axis (leading-dim stage split).
PIPELINE_BLOCKS = "pipeline_blocks"


def _stacked_conv_init(depth: int, k: int, cin: int, cout: int):
    """He-normal per block: variance_scaling on the PER-BLOCK [k,k,cin,cout]
    fan (a plain initializer on the stacked [L,k,k,cin,cout] shape would
    fold L into the receptive field and undershoot the variance by L)."""
    one = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")

    def init(key, shape, dtype=jnp.float32):
        assert tuple(shape) == (depth, k, k, cin, cout), shape
        keys = jax.random.split(key, depth)
        return jax.vmap(lambda kk: one(kk, (k, k, cin, cout), dtype))(keys)

    return init


def group_norm(h: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """Functional GroupNorm over NHWC (normalizes each sample's
    [H, W, C/G] group independently — no cross-sample coupling)."""
    B, H, W, C = h.shape
    g = h.reshape(B, H, W, groups, C // groups)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, H, W, C) * scale + bias


def residual_block(params: Dict[str, jnp.ndarray], h: jnp.ndarray,
                   *, groups: int) -> jnp.ndarray:
    """One trunk block: h + conv(relu(gn(conv(relu(gn(h)))))) —
    pre-activation residual, shape-preserving, sample-independent.
    `params` leaves are a single block's slice (no leading [L])."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = group_norm(h, params["gn1_scale"], params["gn1_bias"], groups)
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(
        y, params["conv1"].astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=dn,
    )
    y = group_norm(y, params["gn2_scale"], params["gn2_bias"], groups)
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(
        y, params["conv2"].astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=dn,
    )
    return h + y


class _StackedTrunk(nn.Module):
    """Owns the [L]-stacked block params (under the PIPELINE_BLOCKS name)
    and applies them via `trunk_apply` (sequential scan by default,
    pipeline-parallel when the workload injects one)."""

    depth: int
    width: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,
        trunk_apply: Optional[Callable] = None,
    ) -> jnp.ndarray:
        L, C = self.depth, self.width
        stacked = {
            "conv1": self.param(
                "conv1", _stacked_conv_init(L, 3, C, C), (L, 3, 3, C, C)
            ),
            "conv2": self.param(
                "conv2", _stacked_conv_init(L, 3, C, C), (L, 3, 3, C, C)
            ),
            "gn1_scale": self.param(
                "gn1_scale", nn.initializers.ones, (L, 1, 1, 1, C)
            ),
            "gn1_bias": self.param(
                "gn1_bias", nn.initializers.zeros, (L, 1, 1, 1, C)
            ),
            "gn2_scale": self.param(
                "gn2_scale", nn.initializers.ones, (L, 1, 1, 1, C)
            ),
            "gn2_bias": self.param(
                "gn2_bias", nn.initializers.zeros, (L, 1, 1, 1, C)
            ),
        }
        stacked = jax.tree.map(lambda p: p.astype(self.dtype), stacked)
        block = lambda p, x: residual_block(p, x, groups=self.groups)  # noqa: E731
        if trunk_apply is None:
            from automoe_tpu.parallel.pp import sequential_apply

            return sequential_apply(block, stacked, h)
        return trunk_apply(block, stacked, h)


class DeepTrajectoryPolicy(nn.Module):
    """TrajectoryPolicy with a deep pipelineable trunk.

    Same interface and output contract as `models/policy.py::
    TrajectoryPolicy` (waypoints [B,H,2] + speed [B,H] from image [+
    context]); the backbone swaps EasyBackbone's 4 BN convs for
    stem(stride 4) → L residual GroupNorm blocks → GN → pool → fc.

    `__call__(..., trunk_apply=...)` lets the training wrapper run the
    trunk pipelined (pp.grouped_pipeline_apply bound to a mesh) without
    the module knowing about meshes; init and eval default to the
    sequential scan, which is numerically identical.
    """

    horizon: int = 8
    context_dim: int = 0
    backbone_dim: int = 512
    depth: int = 16
    width: int = 128
    groups: int = 8
    stem_stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
        trunk_apply: Optional[Callable] = None,
    ) -> Dict[str, jnp.ndarray]:
        from automoe_tpu.models.policy import _Head

        s = self.stem_stride
        h = nn.Conv(
            self.width, (5, 5), strides=(s, s), padding=((2, 2), (2, 2)),
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(image)
        h = group_norm(
            h,
            self.param("stem_gn_scale", nn.initializers.ones,
                       (1, 1, self.width)).astype(self.dtype),
            self.param("stem_gn_bias", nn.initializers.zeros,
                       (1, 1, self.width)).astype(self.dtype),
            self.groups,
        )
        h = jax.nn.relu(h)
        h = _StackedTrunk(
            self.depth, self.width, self.groups, self.dtype,
            name=PIPELINE_BLOCKS,
        )(h, trunk_apply=trunk_apply)
        h = jnp.mean(h, axis=(1, 2))
        feat = nn.Dense(self.backbone_dim, dtype=self.dtype, name="fc")(h)
        x = (feat if context is None
             else jnp.concatenate([feat, context], axis=-1))
        wp = _Head(self.horizon * 2, dtype=self.dtype, name="head_wp")(x)
        spd = _Head(self.horizon, dtype=self.dtype, name="head_spd")(x)
        return {
            "waypoints": wp.reshape(-1, self.horizon, 2),
            "speed": spd.reshape(-1, self.horizon),
        }


def trunk_flops_per_sample(depth: int, width: int, hw: int) -> float:
    """Analytic trunk MACs→FLOPs per sample (2 convs of 3x3xCxC per block
    over an hw x hw map) — used by the PP benchmarks to sanity-check
    utilization."""
    macs = depth * 2 * (hw * hw) * 9 * width * width
    return 2.0 * macs


__all__ = [
    "DeepTrajectoryPolicy",
    "PIPELINE_BLOCKS",
    "group_norm",
    "residual_block",
    "trunk_flops_per_sample",
]
