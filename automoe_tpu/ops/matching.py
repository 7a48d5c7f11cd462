"""On-device DETR-style set matching.

The reference (training/hungarian_matcher.py:21-85) builds the cost matrix
on-GPU, copies it to the CPU, and runs scipy's sequential
`linear_sum_assignment` once per sample — a device sync inside the hot
training loop. Here the whole thing stays on the TPU: the cost matrix is a
batched jnp computation and the assignment is `optax.assignment
.hungarian_algorithm` (an exact, jittable Hungarian), `vmap`ped over the
batch. Padded targets (label == -1) get a row-uniform sentinel cost, which
provably does not perturb the optimal assignment of real targets.

A host-exact escape hatch (C++ LAPJV via automoe_tpu.ops.lapjv_native)
exists for eval-time verification; it matches bit-for-bit on real costs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from optax import assignment as _assignment

from automoe_tpu.ops.boxes import bev_from_3d, box_convert, generalized_box_iou

#: Row-uniform cost assigned to padded (invalid) target columns. Any finite
#: constant works — uniformity over rows is what keeps real columns' optimal
#: assignment unchanged (exchange argument).
_PAD_COST = 1e6


def match_cost_matrix(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    tgt_boxes: jnp.ndarray,
    tgt_labels: jnp.ndarray,
    *,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> jnp.ndarray:
    """Per-sample DETR matching cost. Shapes: [Q,C], [Q,D], [N,D], [N] -> [Q,N].

    Cost = cost_bbox * L1(pred, tgt) + cost_class * (-softmax prob of tgt
    class) + cost_giou * (-GIoU), with 2D GIoU for D==4 boxes (cxcywh) and
    axis-aligned BEV GIoU for D==7 3D boxes, mirroring the reference
    (training/hungarian_matcher.py:36-73). Padded targets (label < 0) are
    replaced by a row-uniform sentinel.
    """
    valid = tgt_labels >= 0  # [N]
    labels = jnp.clip(tgt_labels, 0)

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)  # [Q,C]
    c_class = -prob[:, labels]  # [Q,N]

    pb = pred_boxes.astype(jnp.float32)
    tb = tgt_boxes.astype(jnp.float32)
    c_bbox = jnp.sum(jnp.abs(pb[:, None, :] - tb[None, :, :]), axis=-1)  # [Q,N]

    d = pred_boxes.shape[-1]
    if cost_giou > 0 and d == 4:
        c_giou = -generalized_box_iou(
            box_convert(pb, "cxcywh", "xyxy"), box_convert(tb, "cxcywh", "xyxy")
        )
    elif cost_giou > 0 and d == 7:
        c_giou = -generalized_box_iou(bev_from_3d(pb), bev_from_3d(tb))
    else:
        c_giou = jnp.zeros_like(c_bbox)

    cost = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
    return jnp.where(valid[None, :], cost, _PAD_COST)


@functools.partial(jax.jit, static_argnames=("cost_class", "cost_bbox", "cost_giou"))
def hungarian_match(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    tgt_boxes: jnp.ndarray,
    tgt_labels: jnp.ndarray,
    *,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
):
    """Batched exact Hungarian matching, fully on device.

    Args:
      pred_logits: [B, Q, C]
      pred_boxes:  [B, Q, D] (D == 4 cxcywh, or 7 for 3D)
      tgt_boxes:   [B, N, D] padded with zeros
      tgt_labels:  [B, N]   padded with -1

    Returns:
      query_idx: [B, N] int32 — for each target slot, the matched query.
      valid:     [B, N] bool  — True where the target slot is real.

    Requires N <= Q (targets beyond the query count cannot all be matched;
    callers cap/pad targets to a static N).
    """
    B, Q, _ = pred_logits.shape
    N = tgt_labels.shape[1]
    if N > Q:
        raise ValueError(f"target cap N={N} exceeds query count Q={Q}")

    def per_sample(logits, boxes, t_boxes, t_labels):
        cost = match_cost_matrix(
            logits,
            boxes,
            t_boxes,
            t_labels,
            cost_class=cost_class,
            cost_bbox=cost_bbox,
            cost_giou=cost_giou,
        )
        # optax expects [rows, cols]; with N <= Q every column gets a row.
        i, j = _assignment.hungarian_algorithm(cost)  # each [min(Q,N)] = [N]
        # Scatter so that query_idx[col] = row.
        query_idx = jnp.zeros((N,), jnp.int32).at[j].set(i.astype(jnp.int32))
        return query_idx

    query_idx = jax.vmap(per_sample)(pred_logits, pred_boxes, tgt_boxes, tgt_labels)
    return query_idx, tgt_labels >= 0
