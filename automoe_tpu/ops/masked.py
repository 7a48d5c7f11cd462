"""Masked reductions replacing torch's ignore_index / boolean-mask losses.

TPU/XLA needs static shapes, so the reference's dynamic boolean indexing
(e.g. `pred[matched_mask]`, training/train_bdd100k_ddp.py:178-183, and
`CrossEntropyLoss(ignore_index=...)`) becomes `where`-masked means here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int
) -> jnp.ndarray:
    """Mean CE over positions whose label != ignore_index.

    logits: [..., C]; labels: [...] int. Matches
    torch.nn.CrossEntropyLoss(ignore_index=...) (mean over non-ignored).
    """
    mask = labels != ignore_index
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise SmoothL1 (Huber with beta), matching torch.nn.SmoothL1Loss."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def masked_smooth_l1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    reduction: str = "mean",
    beta: float = 1.0,
) -> jnp.ndarray:
    """SmoothL1 over masked rows. mask broadcasts over trailing dims.

    reduction='mean' averages over all elements of selected rows (matching
    torch's SmoothL1Loss(reduction='mean') on boolean-indexed tensors);
    'sum' matches reduction='sum' (used by the reference detection eval,
    eval/evaluate_bdd100k_expert.py:33).
    """
    per_elem = smooth_l1(pred, target, beta)
    m = jnp.broadcast_to(mask[..., None].astype(per_elem.dtype), per_elem.shape)
    total = jnp.sum(per_elem * m)
    if reduction == "sum":
        return total
    return total / jnp.maximum(jnp.sum(m), 1.0)
