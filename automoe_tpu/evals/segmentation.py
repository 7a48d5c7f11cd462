"""Segmentation / drivable evaluation: val loss, pixel accuracy, mean IoU.

Metric semantics replicate the reference (eval/evaluate_bdd100k_expert.py:
137-180): per-batch pixel accuracy over non-ignore pixels; per-batch mean
IoU over classes present in the GT (union excludes ignore pixels); both
averaged over batches.
"""
from __future__ import annotations

import functools
from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.losses.segmentation import segmentation_loss


def seg_metrics(logits: jnp.ndarray, masks: jnp.ndarray, *, num_classes: int
                ) -> Dict[str, jnp.ndarray]:
    """Pixel accuracy + mean IoU (no loss) — reusable from training-time
    validation without recomputing the CE."""
    preds = jnp.argmax(logits, axis=-1)
    ignore = masks == 255
    valid = ~ignore
    correct = (preds == masks) & valid
    pixel_acc = jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)

    cls = jnp.arange(num_classes)
    gt_cls = (masks[None] == cls[:, None, None, None])  # [C,B,H,W]
    pred_cls = (preds[None] == cls[:, None, None, None])
    inter = jnp.sum(gt_cls & pred_cls, axis=(1, 2, 3)).astype(jnp.float32)
    union = jnp.sum((gt_cls | pred_cls) & valid[None], axis=(1, 2, 3)).astype(
        jnp.float32
    )
    present = jnp.sum(gt_cls, axis=(1, 2, 3)) > 0
    countable = present & (union > 0)
    iou = jnp.where(countable, inter / jnp.maximum(union, 1.0), 0.0)
    mean_iou = jnp.sum(iou) / jnp.maximum(jnp.sum(countable), 1)
    return {"pixel_acc": pixel_acc, "mean_iou": mean_iou}


@functools.partial(jax.jit, static_argnames=("num_classes",))
def seg_eval_batch(
    logits: jnp.ndarray, masks: jnp.ndarray, *, num_classes: int
) -> Dict[str, jnp.ndarray]:
    loss = segmentation_loss(logits, masks)["loss"]
    return {"loss": loss, **seg_metrics(logits, masks, num_classes=num_classes)}


def evaluate_seg_like(
    apply_fn, variables, batches: Iterable, *, num_classes: int
) -> Dict[str, float]:
    total_loss, accs, ious, n = 0.0, [], [], 0
    for batch in batches:
        logits = apply_fn(variables, jnp.asarray(batch["image"]))
        m = seg_eval_batch(
            logits, jnp.asarray(batch["mask"]), num_classes=num_classes
        )
        total_loss += float(m["loss"])
        accs.append(float(m["pixel_acc"]))
        ious.append(float(m["mean_iou"]))
        n += 1
    n = max(1, n)
    return {
        "val_loss": total_loss / n,
        "pixel_acc": float(np.mean(accs)) if accs else 0.0,
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
    }
