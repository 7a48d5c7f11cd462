"""Inspect a preprocessed CARLA run (counterpart of the reference's
notebooks/explore_carla_run.ipynb): prints per-frame stats and saves a
contact sheet + ego-trajectory plot.

Usage: python examples/explore_carla_run.py --run datasets/carla/preprocessed/train/run_001
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from automoe_tpu.data.datasets import _image_hwc, _load_pt, _to_np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--out", default="examples_out")
    p.add_argument("--max-frames", type=int, default=16)
    args = p.parse_args(argv)

    files = sorted(Path(args.run).glob("*.pt"))
    print(f"{len(files)} frames in {args.run}")
    xs, ys, speeds = [], [], []
    tiles = []
    for i, f in enumerate(files):
        s = _load_pt(f)
        vs = s["vehicle_state"]
        loc = _to_np(vs["location"])
        xs.append(float(loc[0])), ys.append(float(loc[1]))
        speeds.append(float(_to_np(vs["speed_kmh"])))
        if i < args.max_frames:
            tiles.append(_image_hwc(s["image"]))
        if i < 3:
            n_boxes = len(_to_np(s["bboxes"])) if s.get("bboxes") is not None else 0
            print(
                f"  frame {i}: speed {speeds[-1]:.1f} km/h, boxes {n_boxes}, "
                f"mask {'yes' if s.get('mask') is not None else 'no'}, "
                f"lidar {'yes' if s.get('lidar') is not None else 'no'}"
            )
    print(f"speed: mean {np.mean(speeds):.1f} max {np.max(speeds):.1f} km/h")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 5))
    a1.plot(xs, ys, ".-")
    a1.set_title("ego trajectory (world XY)")
    a1.axis("equal")
    a2.plot(speeds)
    a2.set_title("speed (km/h)")
    fig.tight_layout()
    fig.savefig(out / "carla_run_overview.png", dpi=150)

    if tiles:
        n = len(tiles)
        cols = min(4, n)
        rows = (n + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
        for ax, t in zip(np.atleast_1d(axes).ravel(), tiles):
            # un-normalize for display
            t = t * np.array([0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
            ax.imshow(np.clip(t, 0, 1))
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(out / "carla_run_frames.png", dpi=120)
    print(f"wrote plots to {out}/")


if __name__ == "__main__":
    main()
