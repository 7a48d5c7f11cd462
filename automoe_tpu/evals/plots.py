"""Plot/visualization artifacts (matplotlib/PIL), parity with the
reference eval tooling:

  * expert usage bar + pie charts (eval/evaluate_gating_network.py:106-132)
  * correlation heatmaps (:239-254)
  * detection GT-vs-prediction overlays, GT green / predictions red
    (eval/visualize_bdd100k_detection.py:15-81)
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np


def plot_expert_usage(
    expert_usage: Sequence[float],
    expert_std: Sequence[float],
    expert_names: Sequence[str],
    save_path: str,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    usage = np.asarray(expert_usage)
    std = np.asarray(expert_std)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    ax1.bar(expert_names, usage, yerr=std, capsize=4)
    ax1.set_ylabel("Mean gating weight")
    ax1.set_title("Expert usage (mean ± std)")
    ax1.tick_params(axis="x", rotation=30)
    ax2.pie(usage, labels=expert_names, autopct="%1.1f%%")
    ax2.set_title("Expert usage share")
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=200, bbox_inches="tight")
    plt.close(fig)


def plot_training_curves(
    metrics_jsonl: str,
    save_path: str,
    tags: Optional[Sequence[str]] = None,
    max_panels: int = 4,
) -> List[str]:
    """Panel grid of training curves from a run's metrics.jsonl (parity
    with the reference's TensorBoard-scraping plot_training_curves,
    eval/evaluate_gating_network.py:135-167 — our runs log JSONL + TB, and
    JSONL is the durable source). Plots the first `max_panels` scalar tags
    (or the given `tags`) against step. Returns the tags plotted."""
    import json

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series: dict = {}
    for line in Path(metrics_jsonl).read_text().splitlines():
        rec = json.loads(line)
        step = rec.get("step", 0)
        for k, v in rec.items():
            if k in ("step", "time") or not isinstance(v, (int, float)):
                continue
            series.setdefault(k, []).append((step, v))
    chosen = list(tags) if tags else list(series)[:max_panels]
    chosen = [t for t in chosen if t in series][:max_panels]
    if not chosen:
        raise ValueError(f"no scalar series found in {metrics_jsonl}")

    rows = (len(chosen) + 1) // 2
    fig, axes = plt.subplots(rows, 2, figsize=(12, 4 * rows), squeeze=False)
    flat = axes.flatten()
    for ax in flat[len(chosen):]:
        ax.axis("off")
    for ax, tag in zip(flat, chosen):
        pts = series[tag]
        ax.plot([p[0] for p in pts], [p[1] for p in pts])
        ax.set_title(tag)
        ax.set_xlabel("Step")
        ax.set_ylabel("Value")
        ax.grid(True)
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return chosen


def plot_correlation_heatmap(
    matrix: np.ndarray,
    context_names: Sequence[str],
    expert_names: Sequence[str],
    title: str,
    save_path: str,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(
        figsize=(1.6 * len(expert_names) + 3, 1.1 * len(context_names) + 2)
    )
    im = ax.imshow(matrix, cmap="RdBu_r", vmin=-0.8, vmax=0.8, aspect="auto")
    ax.set_yticks(range(len(context_names)), context_names)
    ax.set_xticks(range(len(expert_names)), expert_names, rotation=45, ha="right")
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close(fig)


def draw_detections(
    image_01: np.ndarray,
    gt_boxes_xyxy: Optional[np.ndarray],
    pred_boxes_xyxy: Optional[np.ndarray],
    save_path: str,
    pred_scores: Optional[np.ndarray] = None,
) -> None:
    """image [H,W,3] in [0,1]; GT drawn green, predictions red."""
    from PIL import Image, ImageDraw

    img = Image.fromarray((np.clip(image_01, 0, 1) * 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    H, W = image_01.shape[:2]

    def _draw(boxes, color, scores=None):
        if boxes is None:
            return
        for i, b in enumerate(np.asarray(boxes).reshape(-1, 4)):
            if (b < 0).all():
                continue
            x1, y1, x2, y2 = [float(v) for v in b]
            # raw predictions may have inverted corners (negative w/h)
            x1, x2 = sorted((x1, x2))
            y1, y2 = sorted((y1, y2))
            box = [max(0, x1), max(0, y1), min(W - 1, x2), min(H - 1, y2)]
            if box[2] <= box[0] or box[3] <= box[1]:
                continue
            draw.rectangle(box, outline=color, width=2)
            if scores is not None:
                draw.text((x1 + 2, y1 + 2), f"{scores[i]:.2f}", fill=color)

    _draw(gt_boxes_xyxy, (0, 255, 0))
    _draw(pred_boxes_xyxy, (255, 0, 0), pred_scores)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    img.save(save_path)


def topk_predictions(
    class_logits: np.ndarray,
    bbox_deltas: np.ndarray,
    *,
    k: int = 10,
    threshold: float = 0.3,
    image_hw: tuple = (256, 256),
):
    """Dense-grid cells → top-k thresholded cxcywh→xyxy pixel boxes
    (semantics of eval/visualize_bdd100k_detection.py:15-81: scores are
    max softmax prob per cell)."""
    h, w, C = class_logits.shape
    probs = np.exp(class_logits - class_logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    scores = probs.max(-1).reshape(-1)
    boxes = bbox_deltas.reshape(-1, 4)
    order = np.argsort(-scores)[:k]
    keep = order[scores[order] >= threshold]
    cx, cy, bw, bh = boxes[keep].T
    H, W = image_hw
    xyxy = np.stack(
        [(cx - bw / 2) * W, (cy - bh / 2) * H, (cx + bw / 2) * W, (cy + bh / 2) * H],
        axis=-1,
    )
    return xyxy, scores[keep]


def analyze_detection_per_image(
    sample_metrics: List[dict], save_path: Optional[str] = None
) -> List[dict]:
    """Per-image nGT/nMatch/meanIoU/recall table (parity with
    eval/analyze_bdd100k_detection_batch.py:15-89). Input: list of dicts
    with keys n_gt, n_match, mean_iou, recall; writes JSON when asked."""
    import json

    rows = [
        {
            "index": i,
            "n_gt": int(m["n_gt"]),
            "n_match": int(m["n_match"]),
            "mean_iou": float(m["mean_iou"]),
            "recall_0.5": float(m["recall"]),
        }
        for i, m in enumerate(sample_metrics)
    ]
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        Path(save_path).write_text(json.dumps(rows, indent=2))
    return rows
