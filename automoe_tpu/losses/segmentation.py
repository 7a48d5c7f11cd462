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
    # Out-of-range labels → ignore, at loss time like the reference CARLA
    # fine-tune trainer (train_carla_bdd_experts_ddp.py:132-138). The
    # datasets sanitize raw CARLA IDs at load time too, but packed caches
    # written before that fix (or by external tools) bypass the Dataset
    # path — without this, take_along_axis would silently clamp e.g. raw
    # ID 23 to the last class instead of ignoring it.
    C = logits.shape[-1]
    invalid = (masks < 0) | ((masks >= C) & (masks != ignore_index))
    masks = jnp.where(invalid, ignore_index, masks)
    loss = masked_cross_entropy(logits, masks, ignore_index=ignore_index)
    return {"loss": loss}
