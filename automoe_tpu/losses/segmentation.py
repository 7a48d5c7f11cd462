"""Segmentation / drivable-area loss: CE with ignore-index 255.

Mirrors the reference seg path (training/train_bdd100k_ddp.py:58,186-194).
Logits are NHWC [B,H,W,C]; masks are [B,H,W] int with 255 = ignore.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from automoe_tpu.ops.masked import masked_cross_entropy

IGNORE_INDEX = 255


def segmentation_loss(
    logits: jnp.ndarray, masks: jnp.ndarray, *, ignore_index: int = IGNORE_INDEX
) -> Dict[str, jnp.ndarray]:
    loss = masked_cross_entropy(logits, masks, ignore_index=ignore_index)
    return {"loss": loss}
