"""Pure-JAX box geometry ops.

Re-provides the torchvision.ops surface the reference depends on
(`box_convert`, `box_iou`, `generalized_box_iou`; used at
reference training/hungarian_matcher.py:4,49-66 and
training/train_bdd100k_ddp.py:12) as vectorised jnp functions that fuse
into the surrounding XLA computation — no host round trips.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_convert(boxes: jnp.ndarray, in_fmt: str, out_fmt: str) -> jnp.ndarray:
    """Convert boxes between 'xyxy' and 'cxcywh' formats. [..., 4] -> [..., 4]."""
    if in_fmt == out_fmt:
        return boxes
    if in_fmt == "xyxy" and out_fmt == "cxcywh":
        x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
        return jnp.concatenate(
            [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
        )
    if in_fmt == "cxcywh" and out_fmt == "xyxy":
        cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
        hw, hh = w * 0.5, h * 0.5
        return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)
    raise ValueError(f"unsupported conversion {in_fmt} -> {out_fmt}")


def _area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: [N,4] x [M,4] -> [N,M]."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = _area(boxes1)[..., :, None] + _area(boxes2)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes: [N,4] x [M,4] -> [N,M].

    Matches torchvision.ops.generalized_box_iou semantics
    (GIoU = IoU - (hull - union) / hull).
    """
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = _area(boxes1)[..., :, None] + _area(boxes2)[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)

    hull_lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    hull_rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    hull_wh = jnp.clip(hull_rb - hull_lt, 0.0)
    hull = hull_wh[..., 0] * hull_wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def bev_from_3d(boxes7: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned BEV xyxy footprint of 7-dim 3D boxes [cx,cy,cz,w,l,h,yaw].

    Drops z/yaw exactly like the reference's approximate BEV GIoU
    (reference training/hungarian_matcher.py:50-66).
    """
    cx, cy = boxes7[..., 0], boxes7[..., 1]
    w, l = boxes7[..., 3], boxes7[..., 4]
    return jnp.stack(
        [cx - w * 0.5, cy - l * 0.5, cx + w * 0.5, cy + l * 0.5], axis=-1
    )
