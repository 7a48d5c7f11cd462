"""BDD detection expert evaluation.

Metric definitions are replicated from the reference
(eval/evaluate_bdd100k_expert.py:23-134) including its quirks:
  * val loss uses SmoothL1 with reduction='sum' over matched boxes
    (`:33`) — unlike training, which uses the mean;
  * avg_iou: per-sample mean IoU of matched pred/GT pairs, averaged over
    samples *that have matches*, then over batches;
  * recall@0.5: per-sample fraction of GT boxes covered by any query at
    IoU ≥ 0.5, averaged over samples *with GT*, then over batches.
All per-batch math runs jitted on device; the host loop only aggregates.
"""
from __future__ import annotations

import functools
from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.losses.detection import detection_set_loss
from automoe_tpu.ops.boxes import box_convert, box_iou


def matched_iou_recall(pred_boxes, gt_boxes_xyxy, query_idx, valid):
    """Per-sample matched IoU and recall@0.5 from an existing assignment.

    pred_boxes [B,Q,4] cxcywh, gt_boxes_xyxy [B,N,4], query_idx/valid
    [B,N]. Returns (sample_iou [B], sample_recall [B], has_match [B]) —
    the reference's val metrics (train_bdd100k_ddp.py:266-294)."""
    matched_pred = jnp.take_along_axis(
        pred_boxes, query_idx[..., None], axis=1
    )  # [B,N,4]
    gt_cxcywh = box_convert(gt_boxes_xyxy, "xyxy", "cxcywh")
    pair_iou = jax.vmap(
        lambda p, g: jnp.diagonal(
            box_iou(box_convert(p, "cxcywh", "xyxy"),
                    box_convert(g, "cxcywh", "xyxy"))
        )
    )(matched_pred, gt_cxcywh)  # [B,N]
    n_valid = jnp.sum(valid, axis=1)
    has_match = n_valid > 0
    sample_iou = jnp.sum(jnp.where(valid, pair_iou, 0.0), axis=1) / jnp.maximum(
        n_valid, 1
    )

    def recall_one(pb, gb, v):
        mat = box_iou(
            box_convert(pb, "cxcywh", "xyxy"), box_convert(gb, "xyxy", "xyxy")
        )  # [Q,N]
        covered = jnp.max(mat, axis=0) >= 0.5
        return jnp.sum(jnp.where(v, covered, False)) / jnp.maximum(jnp.sum(v), 1)

    sample_recall = jax.vmap(recall_one)(pred_boxes, gt_boxes_xyxy, valid)
    return sample_iou, sample_recall, has_match


@functools.partial(jax.jit, static_argnames=("num_classes", "bbox_loss_weight"))
def detection_eval_batch(
    class_logits: jnp.ndarray,
    bbox_deltas: jnp.ndarray,
    gt_boxes_xyxy: jnp.ndarray,
    gt_labels: jnp.ndarray,
    *,
    num_classes: int,
    bbox_loss_weight: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    B, h, w, C = class_logits.shape
    Q = h * w
    res = detection_set_loss(
        class_logits,
        bbox_deltas,
        gt_boxes_xyxy,
        gt_labels,
        num_classes=num_classes,
        bbox_loss_weight=bbox_loss_weight,
        bbox_reduction="sum",  # eval quirk
    )
    pred_boxes = bbox_deltas.reshape(B, Q, 4)
    sample_iou, sample_recall, has_match = matched_iou_recall(
        pred_boxes, gt_boxes_xyxy, res["query_idx"], res["valid"]
    )

    return {
        "loss": res["loss"],
        "sample_iou": sample_iou,
        "sample_recall": sample_recall,
        "has_match": has_match,
    }


def evaluate_detection(
    apply_fn,
    variables,
    batches: Iterable[Dict[str, np.ndarray]],
    *,
    num_classes: int,
    bbox_loss_weight: float = 2.0,
) -> Dict[str, float]:
    """apply_fn(variables, image) -> {class_logits, bbox_deltas} (NHWC)."""
    total_loss, agg_iou, agg_recall = 0.0, [], []
    n_batches = 0
    for batch in batches:
        out = apply_fn(variables, jnp.asarray(batch["image"]))
        m = detection_eval_batch(
            out["class_logits"],
            out["bbox_deltas"],
            jnp.asarray(batch["bboxes"]),
            jnp.asarray(batch["labels"]),
            num_classes=num_classes,
            bbox_loss_weight=bbox_loss_weight,
        )
        total_loss += float(m["loss"])
        has = np.asarray(m["has_match"])
        iou = np.asarray(m["sample_iou"])
        rec = np.asarray(m["sample_recall"])
        agg_iou.append(float(iou[has].mean()) if has.any() else 0.0)
        agg_recall.append(float(rec[has].mean()) if has.any() else 0.0)
        n_batches += 1
    n_batches = max(1, n_batches)
    return {
        "val_loss": total_loss / n_batches,
        "avg_iou": float(np.mean(agg_iou)) if agg_iou else 0.0,
        "recall_0.5": float(np.mean(agg_recall)) if agg_recall else 0.0,
    }
