"""Loss-semantics parity: our on-device losses vs the reference's
torch computation (actual reference matcher + loss recipes run on CPU).
"""
from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.torch_mirror import add_reference_to_path, install_torchvision_stub

install_torchvision_stub()
add_reference_to_path()

import jax.numpy as jnp  # noqa: E402

from automoe_tpu.losses import (  # noqa: E402
    detection_set_loss,
    gating_losses,
    nuscenes_set_loss,
    policy_losses,
    segmentation_loss,
)
from automoe_tpu.ops.boxes import box_convert  # noqa: E402


def _rand_boxes(rng, n):
    cx, cy = rng.uniform(0.2, 0.8, (2, n))
    w, h = rng.uniform(0.05, 0.3, (2, n))
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(
        np.float32
    )


def _torch_detection_loss(pred_logits, pred_boxes, targets, num_classes, bbox_w=2.0):
    """Reference recipe: train_bdd100k_ddp.py:117-194 (CE ignore=C over all
    queries, SmoothL1 mean over matched), using the reference matcher."""
    from training.hungarian_matcher import HungarianMatcher
    from torchvision.ops import box_convert as t_box_convert

    matcher = HungarianMatcher()
    B, Q, C = pred_logits.shape
    targets_cxcywh = []
    for t in targets:
        boxes = t["boxes"]
        if boxes.numel() > 0:
            boxes = t_box_convert(boxes, "xyxy", "cxcywh")
        targets_cxcywh.append({"boxes": boxes, "labels": t["labels"]})
    indices = matcher(
        {"pred_logits": pred_logits, "pred_boxes": pred_boxes}, targets_cxcywh
    )
    tc = torch.full((B * Q,), num_classes, dtype=torch.int64)
    tb = torch.zeros((B * Q, 4))
    for b, (pi, ti) in enumerate(indices):
        tc[b * Q + pi] = targets_cxcywh[b]["labels"][ti]
        tb[b * Q + pi] = targets_cxcywh[b]["boxes"][ti]
    cls = F.cross_entropy(pred_logits.reshape(-1, C), tc, ignore_index=num_classes)
    matched = tc != num_classes
    bbox = (
        F.smooth_l1_loss(pred_boxes.reshape(-1, 4)[matched], tb[matched])
        if matched.any()
        else torch.tensor(0.0)
    )
    return cls + bbox_w * bbox, cls, bbox


def test_detection_set_loss_parity(rng):
    B, h, w, C, N = 3, 4, 4, 10, 6
    Q = h * w
    logits = rng.normal(size=(B, h, w, C)).astype(np.float32)
    deltas = rng.uniform(0.1, 0.9, size=(B, h, w, 4)).astype(np.float32)
    gt_boxes = np.zeros((B, N, 4), np.float32)
    gt_labels = np.full((B, N), -1, np.int64)
    counts = [6, 0, 3]
    for b, n in enumerate(counts):
        gt_boxes[b, :n] = _rand_boxes(rng, n)
        gt_labels[b, :n] = rng.integers(0, C, n)

    out = detection_set_loss(
        jnp.asarray(logits), jnp.asarray(deltas),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels.astype(np.int32)),
        num_classes=C,
    )

    t_logits = torch.from_numpy(logits.reshape(B, Q, C))
    t_boxes = torch.from_numpy(deltas.reshape(B, Q, 4))
    targets = [
        {
            "boxes": torch.from_numpy(gt_boxes[b, : counts[b]]),
            "labels": torch.from_numpy(gt_labels[b, : counts[b]]),
        }
        for b in range(B)
    ]
    ref_total, ref_cls, ref_bbox = _torch_detection_loss(t_logits, t_boxes, targets, C)
    np.testing.assert_allclose(float(out["class_loss"]), float(ref_cls), rtol=1e-4)
    np.testing.assert_allclose(float(out["bbox_loss"]), float(ref_bbox), rtol=1e-4)
    np.testing.assert_allclose(float(out["loss"]), float(ref_total), rtol=1e-4)


def test_nuscenes_set_loss_parity(rng):
    """Reference recipe train_nuscenes_expert_ddp.py:99-115: CE ignore -1
    over matched; SmoothL1 mean over ALL queries with zero pad targets."""
    from training.hungarian_matcher import HungarianMatcher

    B, Q, C, M, D = 2, 12, 10, 5, 4
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = rng.uniform(0.1, 0.9, size=(B, Q, D)).astype(np.float32)
    gt_boxes = np.zeros((B, M, D), np.float32)
    gt_labels = np.full((B, M), -1, np.int64)
    counts = [5, 2]
    for b, n in enumerate(counts):
        gt_boxes[b, :n] = rng.uniform(0.2, 0.8, size=(n, D))
        gt_labels[b, :n] = rng.integers(0, C, n)

    out = nuscenes_set_loss(
        jnp.asarray(logits), jnp.asarray(boxes),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels.astype(np.int32)),
    )

    matcher = HungarianMatcher()
    t_logits, t_boxes = torch.from_numpy(logits), torch.from_numpy(boxes)
    targets = [
        {
            "boxes": torch.from_numpy(gt_boxes[b, : counts[b]]),
            "labels": torch.from_numpy(gt_labels[b, : counts[b]]),
        }
        for b in range(B)
    ]
    indices = matcher({"pred_logits": t_logits, "pred_boxes": t_boxes}, targets)
    tc = torch.full((B, Q), -1, dtype=torch.int64)
    tb = torch.zeros_like(t_boxes)
    for b, (pi, ti) in enumerate(indices):
        tc[b, pi] = targets[b]["labels"][ti]
        tb[b, pi] = targets[b]["boxes"][ti]
    ref_cls = F.cross_entropy(t_logits.reshape(-1, C), tc.reshape(-1), ignore_index=-1)
    ref_bbox = F.smooth_l1_loss(t_boxes, tb, reduction="none").mean()
    ref_total = ref_cls + 5.0 * ref_bbox
    np.testing.assert_allclose(float(out["class_loss"]), float(ref_cls), rtol=1e-4)
    np.testing.assert_allclose(float(out["bbox_loss"]), float(ref_bbox), rtol=1e-4)
    np.testing.assert_allclose(float(out["loss"]), float(ref_total), rtol=1e-4)


def test_segmentation_loss_parity(rng):
    B, H, W, C = 2, 8, 8, 19
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    masks = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    masks[0, :2] = 255  # ignore region
    out = segmentation_loss(jnp.asarray(logits), jnp.asarray(masks.astype(np.int32)))
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(masks),
        ignore_index=255,
    )
    np.testing.assert_allclose(float(out["loss"]), float(ref), rtol=1e-5)


def test_segmentation_loss_sanitizes_out_of_range_labels(rng):
    """Raw CARLA IDs (>= num_classes) and negatives are treated as ignore
    at LOSS time, like the reference fine-tune trainer
    (train_carla_bdd_experts_ddp.py:132-138) — covers packed caches that
    bypass the Dataset-level sanitization."""
    B, H, W, C = 2, 8, 8, 3
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    masks = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    dirty = masks.copy()
    dirty[0, 0] = 23   # raw CARLA semantic ID
    dirty[0, 1] = -1
    dirty[1, 0] = 255  # already-ignore stays ignore
    clean = dirty.copy()
    clean[0, 0] = 255
    clean[0, 1] = 255
    out_dirty = segmentation_loss(
        jnp.asarray(logits), jnp.asarray(dirty.astype(np.int32))
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(clean),
        ignore_index=255,
    )
    np.testing.assert_allclose(float(out_dirty["loss"]), float(ref), rtol=1e-5)


def test_policy_losses_parity(rng):
    B, H = 4, 10
    pred_wp = rng.normal(size=(B, H, 2)).astype(np.float32)
    pred_spd = rng.normal(size=(B, H)).astype(np.float32)
    t_wp = rng.normal(size=(B, H, 2)).astype(np.float32)
    t_spd = rng.normal(size=(B, H)).astype(np.float32)
    out = policy_losses(
        {"waypoints": jnp.asarray(pred_wp), "speed": jnp.asarray(pred_spd)},
        jnp.asarray(t_wp), jnp.asarray(t_spd),
    )
    p, tw, ts = map(torch.from_numpy, (pred_wp, t_wp, t_spd))
    sp = torch.from_numpy(pred_spd)
    ade = F.l1_loss(p, tw)
    fde = F.l1_loss(p[:, -1], tw[:, -1])
    l_spd = F.l1_loss(sp, ts)
    d = p[:, 1:] - p[:, :-1]
    smooth = F.l1_loss(d[:, 1:], d[:, :-1])
    ref = ade + 2.0 * fde + 0.2 * l_spd + 0.1 * smooth
    np.testing.assert_allclose(float(out["loss"]), float(ref), rtol=1e-5)


def test_gating_losses_parity(rng):
    """vs the actual reference compute_gating_losses (train_gating_network.py:21)."""
    import importlib

    ref_mod = importlib.import_module("training.train_gating_network")
    B, H, E = 4, 10, 4
    pred = {
        "waypoints": rng.normal(size=(B, H, 2)).astype(np.float32),
        "speed_seq": rng.normal(size=(B, H)).astype(np.float32),
        "speed": rng.normal(size=(B, 1)).astype(np.float32),
    }
    w = rng.uniform(0.1, 1.0, size=(B, E)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    pred["expert_weights"] = w
    t_wp = rng.normal(size=(B, H, 2)).astype(np.float32)
    t_spd = rng.normal(size=(B, H)).astype(np.float32)

    out = gating_losses(
        {k: jnp.asarray(v) for k, v in pred.items()},
        jnp.asarray(t_wp), jnp.asarray(t_spd), {},
    )
    ref = ref_mod.compute_gating_losses(
        {k: torch.from_numpy(v) for k, v in pred.items()},
        torch.from_numpy(t_wp), torch.from_numpy(t_spd), {},
    )
    for key in ("total_loss", "ade", "fde", "speed", "smoothness",
                "load_balancing", "entropy"):
        np.testing.assert_allclose(
            float(out[key]), float(ref[key]), rtol=1e-4, err_msg=key
        )


def test_detection_loss_no_targets(rng):
    """All-empty targets: class loss over nothing → 0, bbox loss 0."""
    B, h, w, C, N = 2, 4, 4, 10, 4
    logits = rng.normal(size=(B, h, w, C)).astype(np.float32)
    deltas = rng.uniform(size=(B, h, w, 4)).astype(np.float32)
    out = detection_set_loss(
        jnp.asarray(logits), jnp.asarray(deltas),
        jnp.zeros((B, N, 4), jnp.float32), jnp.full((B, N), -1, jnp.int32),
        num_classes=C,
    )
    assert float(out["bbox_loss"]) == 0.0
    assert np.isfinite(float(out["loss"]))
