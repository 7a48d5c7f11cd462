"""Detection set loss (Hungarian-matched CE + SmoothL1), fully on device.

Semantics mirror the reference BDD detection trainer
(training/train_bdd100k_ddp.py:117-194):
  * dense per-cell outputs are flattened to Q = H·W queries;
  * GT xyxy boxes are converted to cxcywh before matching;
  * classification CE uses ignore_index == num_classes, i.e. **unmatched
    queries contribute nothing** (the "background" class is ignored, not
    supervised) — mean over matched queries only;
  * bbox SmoothL1 (mean) over matched queries, weighted by
    bbox_loss_weight (default 2.0).

The reference's per-sample scatter loops become one vectorised
segment-scatter; its scipy-on-CPU assignment is the on-device
`hungarian_match`.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax.numpy as jnp

from automoe_tpu.ops.boxes import box_convert
from automoe_tpu.ops.masked import masked_cross_entropy, masked_smooth_l1
from automoe_tpu.ops.matching import hungarian_match


def _get_matcher(name: str):
    """'hungarian' (exact, optax), 'auction' (ε-optimal jnp, ~6x faster on
    TPU), or 'auction_pallas' (VMEM-resident Pallas kernel, ~33x — see
    ops/pallas_auction.py).

    The auction matchers accept an iteration-cap suffix, e.g.
    'auction_pallas:1000' (CLI: `--matcher auction_pallas:1000`). Since
    r4 the Pallas cap is a pure COST knob: elements unconverged at the
    cap escalate in-kernel to an exact Jonker-Volgenant solve, so the
    matching is reference-exact at every cap (the jnp 'auction' keeps
    the r3 greedy-completion semantics). Sweep + on-chip numbers in
    benchmarks/BENCHMARKS.md.
    """
    base, _, iters = name.partition(":")
    if iters and base == "hungarian":
        raise ValueError("hungarian matcher has no iteration cap")
    if base == "hungarian":
        return hungarian_match
    if base == "auction":
        from automoe_tpu.ops.auction import auction_match as fn
    elif base == "auction_pallas":
        from automoe_tpu.ops.pallas_auction import auction_match_pallas as fn
    else:
        raise ValueError(f"unknown matcher {name}")
    if iters:
        return functools.partial(fn, max_iters=int(iters))
    return fn


def scatter_matched_targets(
    query_idx: jnp.ndarray,
    valid: jnp.ndarray,
    tgt_boxes: jnp.ndarray,
    tgt_labels: jnp.ndarray,
    num_queries: int,
    num_classes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build per-query targets from per-target matches.

    Args:
      query_idx: [B, N] matched query per target slot.
      valid:     [B, N] real-target mask.
      tgt_boxes: [B, N, D] (already cxcywh).
      tgt_labels:[B, N].
    Returns:
      target_classes [B, Q] (num_classes where unmatched) and
      target_boxes   [B, Q, D] (zeros where unmatched).
    """
    B, N = query_idx.shape
    D = tgt_boxes.shape[-1]
    target_classes = jnp.full((B, num_queries), num_classes, jnp.int32)
    target_boxes = jnp.zeros((B, num_queries, D), jnp.float32)
    # Invalid slots scatter to a scrap row (index Q) and are dropped.
    scatter_to = jnp.where(valid, query_idx, num_queries)
    batch_ix = jnp.broadcast_to(jnp.arange(B)[:, None], (B, N))
    target_classes = (
        jnp.pad(target_classes, ((0, 0), (0, 1)), constant_values=num_classes)
        .at[batch_ix, scatter_to]
        .set(jnp.where(valid, tgt_labels, num_classes).astype(jnp.int32))[:, :num_queries]
    )
    target_boxes = (
        jnp.pad(target_boxes, ((0, 0), (0, 1), (0, 0)))
        .at[batch_ix, scatter_to]
        .set(jnp.where(valid[..., None], tgt_boxes, 0.0).astype(jnp.float32))[
            :, :num_queries
        ]
    )
    return target_classes, target_boxes


def detection_set_loss(
    class_logits: jnp.ndarray,
    bbox_deltas: jnp.ndarray,
    gt_boxes_xyxy: jnp.ndarray,
    gt_labels: jnp.ndarray,
    *,
    num_classes: int,
    bbox_loss_weight: float = 2.0,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    bbox_reduction: str = "mean",
    matcher: str = "hungarian",
) -> Dict[str, jnp.ndarray]:
    """Full detection loss from dense NHWC expert outputs.

    Args:
      class_logits: [B, h, w, C] dense per-cell logits.
      bbox_deltas:  [B, h, w, 4].
      gt_boxes_xyxy:[B, N, 4] padded with zeros.
      gt_labels:    [B, N] padded with -1.
    """
    B, h, w, C = class_logits.shape
    Q = h * w
    pred_logits = class_logits.reshape(B, Q, C)
    pred_boxes = bbox_deltas.reshape(B, Q, 4)

    tgt_cxcywh = box_convert(gt_boxes_xyxy, "xyxy", "cxcywh")
    match_fn = _get_matcher(matcher)
    query_idx, valid = match_fn(
        pred_logits,
        pred_boxes,
        tgt_cxcywh,
        gt_labels,
        cost_class=cost_class,
        cost_bbox=cost_bbox,
        cost_giou=cost_giou,
    )
    target_classes, target_boxes = scatter_matched_targets(
        query_idx, valid, tgt_cxcywh, gt_labels, Q, num_classes
    )

    class_loss = masked_cross_entropy(
        pred_logits.reshape(B * Q, C),
        target_classes.reshape(B * Q),
        ignore_index=num_classes,
    )
    matched = target_classes.reshape(B * Q) != num_classes
    bbox_loss = masked_smooth_l1(
        pred_boxes.reshape(B * Q, 4),
        target_boxes.reshape(B * Q, 4),
        matched,
        reduction=bbox_reduction,
    )
    total = class_loss + bbox_loss_weight * bbox_loss
    return {
        "loss": total,
        "class_loss": class_loss,
        "bbox_loss": bbox_loss,
        "query_idx": query_idx,
        "valid": valid,
        "target_classes": target_classes,
        "target_boxes": target_boxes,
    }
