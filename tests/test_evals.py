"""Eval-suite parity: our metric implementations vs the reference recipes
(run on the same random model outputs)."""
from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.torch_mirror import add_reference_to_path, install_torchvision_stub

install_torchvision_stub()
add_reference_to_path()

import jax.numpy as jnp  # noqa: E402

from automoe_tpu.evals.detection import detection_eval_batch  # noqa: E402
from automoe_tpu.evals.gating import context_gating_correlation  # noqa: E402
from automoe_tpu.evals.segmentation import seg_eval_batch  # noqa: E402


def test_seg_eval_parity(rng):
    """pixel_acc / mean_iou / loss vs the reference evaluate_seg_like math
    (eval/evaluate_bdd100k_expert.py:137-180)."""
    B, H, W, C = 2, 16, 16, 5
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    masks = rng.integers(0, C, (B, H, W)).astype(np.int64)
    masks[0, :3] = 255

    m = seg_eval_batch(jnp.asarray(logits), jnp.asarray(masks.astype(np.int32)),
                       num_classes=C)

    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
    t_masks = torch.from_numpy(masks)
    loss = F.cross_entropy(t_logits, t_masks, ignore_index=255)
    preds = t_logits.argmax(1)
    ignore = t_masks == 255
    valid = ~ignore
    pixel_acc = (((preds == t_masks) & valid).sum().float() / valid.sum()).item()
    ious = []
    for cls in range(C):
        gt_cls = t_masks == cls
        if gt_cls.sum() == 0:
            continue
        pred_cls = preds == cls
        inter = (pred_cls & gt_cls).sum().float()
        union = ((pred_cls | gt_cls) & ~ignore).sum().float()
        if union.item() > 0:
            ious.append((inter / union).item())
    mean_iou = sum(ious) / len(ious) if ious else 0.0

    np.testing.assert_allclose(float(m["loss"]), float(loss), rtol=1e-5)
    np.testing.assert_allclose(float(m["pixel_acc"]), pixel_acc, rtol=1e-6)
    np.testing.assert_allclose(float(m["mean_iou"]), mean_iou, rtol=1e-5)


def test_detection_eval_batch_runs(rng):
    B, h, w, C, N = 2, 4, 4, 10, 5
    logits = rng.normal(size=(B, h, w, C)).astype(np.float32)
    deltas = rng.uniform(0.1, 0.9, (B, h, w, 4)).astype(np.float32)
    gt = np.zeros((B, N, 4), np.float32)
    lb = np.full((B, N), -1, np.int32)
    gt[0, :3] = [[0.2, 0.2, 0.5, 0.5], [0.4, 0.4, 0.8, 0.8], [0.1, 0.6, 0.3, 0.9]]
    lb[0, :3] = [1, 2, 3]
    m = detection_eval_batch(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(gt), jnp.asarray(lb),
        num_classes=C,
    )
    assert np.isfinite(float(m["loss"]))
    has = np.asarray(m["has_match"])
    assert has[0] and not has[1]
    assert 0.0 <= float(np.asarray(m["sample_iou"])[0]) <= 1.0
    assert 0.0 <= float(np.asarray(m["sample_recall"])[0]) <= 1.0


def test_detection_eval_loss_uses_sum_reduction(rng):
    """Eval bbox loss is SmoothL1(sum), not mean — reference quirk at
    eval/evaluate_bdd100k_expert.py:33."""
    from automoe_tpu.losses.detection import detection_set_loss

    B, h, w, C, N = 1, 4, 4, 10, 2
    logits = rng.normal(size=(B, h, w, C)).astype(np.float32)
    deltas = rng.uniform(0.1, 0.9, (B, h, w, 4)).astype(np.float32)
    gt = np.array([[[0.2, 0.2, 0.5, 0.5], [0.4, 0.4, 0.8, 0.8]]], np.float32)
    lb = np.array([[1, 2]], np.int32)
    ev = detection_eval_batch(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(gt), jnp.asarray(lb),
        num_classes=C,
    )
    tr = detection_set_loss(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(gt), jnp.asarray(lb),
        num_classes=C,
    )
    # sum-reduced bbox loss over 2 matched boxes x 4 dims = 8x the mean
    assert float(ev["loss"]) > float(tr["loss"])


def test_correlation_analysis(rng):
    N = 200
    ctx = rng.normal(size=(N, 4)).astype(np.float32)
    # make expert 0 correlate with context feature 1
    w_raw = rng.uniform(0.1, 1.0, size=(N, 3)).astype(np.float32)
    w_raw[:, 0] += 2.0 * (ctx[:, 1] > 0)
    w = w_raw / w_raw.sum(-1, keepdims=True)
    ctx[:, 3] = 0.0  # constant column → must be dropped

    res = context_gating_correlation(
        ctx, w, context_names=["speed", "steering", "throttle", "brake"],
        expert_names=["det", "seg", "drv"],
    )
    assert res["context_names"] == ["speed", "steering", "throttle"]
    assert res["pearson"].shape == (3, 3)
    i = res["context_names"].index("steering")
    assert res["pearson"][i, 0] > 0.3
    assert abs(res["spearman"][i, 0]) > 0.3


def test_plots_write_files(tmp_path, rng):
    from automoe_tpu.evals.plots import (
        draw_detections,
        plot_correlation_heatmap,
        plot_expert_usage,
        topk_predictions,
    )

    plot_expert_usage([0.3, 0.4, 0.3], [0.05, 0.02, 0.04],
                      ["a", "b", "c"], str(tmp_path / "usage.png"))
    assert (tmp_path / "usage.png").stat().st_size > 0

    plot_correlation_heatmap(
        rng.normal(size=(3, 2)).astype(np.float32), ["x", "y", "z"], ["e0", "e1"],
        "t", str(tmp_path / "heat.png"),
    )
    assert (tmp_path / "heat.png").stat().st_size > 0

    img = rng.random((64, 64, 3)).astype(np.float32)
    logits = rng.normal(size=(2, 2, 10)).astype(np.float32)
    deltas = rng.uniform(0.2, 0.8, (2, 2, 4)).astype(np.float32)
    pred_xyxy, scores = topk_predictions(logits, deltas, k=3, threshold=0.0,
                                         image_hw=(64, 64))
    draw_detections(img, np.array([[5, 5, 30, 30]]), pred_xyxy,
                    str(tmp_path / "det.jpg"), scores)
    assert (tmp_path / "det.jpg").stat().st_size > 0


def test_training_curves_plot(tmp_path):
    """PNG from metrics.jsonl via the plot fn AND the evals CLI (parity
    with reference plot_training_curves,
    eval/evaluate_gating_network.py:135-167)."""
    import json

    from automoe_tpu.evals.cli import main as evals_main
    from automoe_tpu.evals.plots import plot_training_curves

    run = tmp_path / "runs" / "gating_x"
    run.mkdir(parents=True)
    with open(run / "metrics.jsonl", "w") as fh:
        for s in range(10):
            fh.write(json.dumps({
                "step": s, "time": 0.0,
                "train/loss": 3.0 / (s + 1), "train/ade": 1.0 / (s + 1),
                "val/loss": 3.1 / (s + 1), "val/ade": 1.1 / (s + 1),
            }) + "\n")
    tags = plot_training_curves(
        str(run / "metrics.jsonl"), str(tmp_path / "curves.png")
    )
    assert (tmp_path / "curves.png").stat().st_size > 0
    assert tags == ["train/loss", "train/ade", "val/loss", "val/ade"]

    out = evals_main([
        "training-curves", "--run-dir", str(run),
        "--tags", "train/loss,val/loss",
    ])
    assert (run / "training_curves.png").stat().st_size > 0
    assert out["tags"] == ["train/loss", "val/loss"]
