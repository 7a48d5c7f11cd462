"""Fixed-shape padded collates.

The reference pads boxes/LiDAR to the *batch max* (e.g. dataloaders/
bdd_detection_loader.py:27-36, nuscenes_loader.py:45-143) — dynamic shapes
that would retrigger XLA compilation every step. Here every modality pads
to a static cap: labels pad with -1, boxes with -1.0 (BDD convention) or
0.0, LiDAR with zero points. Over-cap boxes are truncated (cap is a config
knob; the loss masks padding so semantics match the reference for all
samples within cap).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np


def pad_boxes(
    boxes: np.ndarray, labels: np.ndarray, cap: int, box_dim: int = 4,
    box_fill: float = -1.0,
) -> tuple[np.ndarray, np.ndarray]:
    out_b = np.full((cap, box_dim), box_fill, np.float32)
    out_l = np.full((cap,), -1, np.int32)
    n = min(len(labels), cap)
    if n:
        out_b[:n] = boxes[:n]
        out_l[:n] = labels[:n]
    return out_b, out_l


def pad_points(points: np.ndarray, cap: int, dim: int = 3) -> np.ndarray:
    out = np.zeros((cap, dim), np.float32)
    n = min(len(points), cap)
    if n:
        out[:n] = points[:n]
    return out


def stack_batch(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    # intersection, not samples[0]'s keys: optional fields (e.g.
    # CarlaSequenceDataset's conditional 'context') may be present in only
    # part of a batch — keying off the first sample either crashed with
    # KeyError mid-epoch or silently dropped the other samples' data
    common = set(samples[0])
    union = set(samples[0])
    for s in samples[1:]:
        common &= set(s)
        union |= set(s)
    keys = [k for k in samples[0] if k in common]
    dropped = union - common
    if dropped:
        import warnings

        warnings.warn(
            f"stack_batch: dropping keys {sorted(dropped)} missing from "
            "some samples in the batch", stacklevel=2,
        )
    out = {}
    for k in keys:
        v0 = samples[0][k]
        if isinstance(v0, np.ndarray):
            out[k] = np.stack([s[k] for s in samples], axis=0)
        else:
            out[k] = [s[k] for s in samples]  # metadata passthrough
    return out
