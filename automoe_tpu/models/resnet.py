"""ResNet-18 backbone in NHWC for TPU.

Structurally equivalent to torchvision's resnet18 as consumed by the
reference experts (reference models/experts/bdd_detection_expert.py:9-10
takes `children()[:-2]` → [B,512,H/32,W/32]; models/experts/
nuscenes_expert.py:108-109 takes `children()[:-1]` which keeps the global
average pool → [B,512]). Implemented channel-last with explicit torch-style
padding so imported torchvision weights reproduce activations exactly.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from automoe_tpu.models.norm import TorchBatchNorm
import jax.numpy as jnp

Dtype = Any


class QATConv(nn.Conv):
    """nn.Conv whose kernel is fake-quantized on READ (straight-through
    estimator, ops/fake_quant.py): the stored param stays float — the
    param tree is identical to nn.Conv's, so checkpoints, torchvision
    import, and the PTQ export path are unaffected — but every forward
    (train AND eval) sees the int8 per-output-channel grid the serving
    path will deploy."""

    def param(self, name, *args, **kwargs):
        p = super().param(name, *args, **kwargs)
        if name == "kernel":
            from automoe_tpu.ops.fake_quant import fake_quant_weight

            p = fake_quant_weight(p)
        return p


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    qat: bool = False  # int8 fake-quant on conv weights + inputs

    # `train` is positional (no keyword-only star): the backbone's remat
    # path lifts this module through nn.remat with static_argnums, which
    # indexes positional args only
    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: TorchBatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        Conv = QATConv if self.qat else nn.Conv
        if self.qat:
            from automoe_tpu.ops.fake_quant import fake_quant_act as fq
        else:
            fq = lambda t: t  # noqa: E731
        residual = x
        y = Conv(
            self.filters,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(fq(x))
        y = nn.relu(norm("bn1")(y))
        y = Conv(
            self.filters,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(fq(y))
        y = norm("bn2")(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = Conv(
                self.filters,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(fq(x))
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18Backbone(nn.Module):
    """conv1..layer4 of ResNet-18. Input [B,H,W,3].

    include_pool=False → [B, H/32, W/32, 512] (torchvision children()[:-2]);
    include_pool=True  → [B, 512]            (children()[:-1], GAP flattened).
    """

    include_pool: bool = False
    dtype: Dtype = jnp.float32
    # rematerialisation: checkpoint each BasicBlock so the backward
    # recomputes one block at a time instead of holding the whole
    # stack's activations (the TPU HBM/FLOPs trade; train/step.py's
    # remat notes explain why per-block, not whole-loss). nn.remat is a
    # name-preserving lifted transform: the param/batch_stats tree is
    # IDENTICAL with remat on or off (torchvision import + parity
    # tests unaffected).
    remat: bool = False
    # QAT: fake-quantize block conv weights (per-output-channel int8)
    # and conv inputs (per-tensor int8) with the straight-through
    # estimator so training optimizes against the grid the int8 serving
    # path deploys (ops/fake_quant.py explains why the grids match
    # after BN folding). The stem conv stays float, mirroring
    # serving/quant.py's DEFAULT_FLOAT_CONVS. Param tree unchanged.
    qat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        Block = (
            nn.remat(BasicBlock, static_argnums=(2,))  # 0=self, 2=train
            if self.remat
            else BasicBlock
        )
        for stage, (filters, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            x = Block(
                filters, stride, self.dtype, qat=self.qat,
                name=f"layer{stage}_0",
            )(x, train)
            x = Block(
                filters, 1, self.dtype, qat=self.qat,
                name=f"layer{stage}_1",
            )(x, train)

        if self.include_pool:
            x = jnp.mean(x, axis=(1, 2))  # global average pool → [B, 512]
        return x
