"""nuScenes expert evaluation: matched CE + SmoothL1 val loss
(reference eval/evaluate_nuscenes_expert.py:12-65)."""
from __future__ import annotations

from typing import Dict, Iterable

import jax.numpy as jnp

from automoe_tpu.losses.nuscenes import nuscenes_set_loss


def evaluate_nuscenes(
    apply_fn, variables, batches: Iterable, *, bbox_loss_weight: float = 5.0
) -> Dict[str, float]:
    total, n = 0.0, 0
    for batch in batches:
        out = apply_fn(
            variables,
            {
                "image": jnp.asarray(batch["image"]),
                "lidar": jnp.asarray(batch["lidar"]),
            },
        )
        res = nuscenes_set_loss(
            out["class_logits"],
            out["bbox_preds"],
            jnp.asarray(batch["boxes"]),
            jnp.asarray(batch["labels"]),
            bbox_loss_weight=bbox_loss_weight,
        )
        total += float(res["loss"])
        n += 1
    return {"val_loss": total / max(1, n)}
