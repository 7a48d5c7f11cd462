"""nuScenes expert set loss.

Mirrors the reference nuScenes trainer (training/train_nuscenes_expert_ddp
.py:44-115): Hungarian matching, then
  * CE with ignore_index == -1 — mean over matched queries only;
  * SmoothL1(reduction='none').mean() over **all** queries, with zero
    target boxes for unmatched queries (a deliberate reference quirk:
    unmatched box predictions are pulled toward zero);
  * total = CE + bbox_loss_weight (default 5.0) * bbox.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from automoe_tpu.losses.detection import scatter_matched_targets
from automoe_tpu.ops.masked import masked_cross_entropy, smooth_l1
from automoe_tpu.ops.matching import hungarian_match


def nuscenes_set_loss(
    class_logits: jnp.ndarray,
    bbox_preds: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    *,
    bbox_loss_weight: float = 5.0,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    matcher: str = "hungarian",
) -> Dict[str, jnp.ndarray]:
    """Args: class_logits [B,Q,C]; bbox_preds [B,Q,D]; gt_boxes [B,M,D]
    (already cxcywh / 3D center format); gt_labels [B,M] padded with -1."""
    B, Q, C = class_logits.shape

    from automoe_tpu.losses.detection import _get_matcher

    query_idx, valid = _get_matcher(matcher)(
        class_logits,
        bbox_preds,
        gt_boxes,
        gt_labels,
        cost_class=cost_class,
        cost_bbox=cost_bbox,
        cost_giou=cost_giou,
    )
    # Unmatched class target is -1 (ignored); scatter with sentinel C then remap.
    target_classes, target_boxes = scatter_matched_targets(
        query_idx, valid, gt_boxes, gt_labels, Q, num_classes=C
    )
    target_classes = jnp.where(target_classes == C, -1, target_classes)

    class_loss = masked_cross_entropy(
        class_logits.reshape(B * Q, C), target_classes.reshape(B * Q), ignore_index=-1
    )
    bbox_loss = jnp.mean(smooth_l1(bbox_preds, target_boxes))  # over ALL queries
    total = class_loss + bbox_loss_weight * bbox_loss
    return {
        "loss": total,
        "class_loss": class_loss,
        "bbox_loss": bbox_loss,
        "query_idx": query_idx,
        "valid": valid,
    }
