"""Inspect preprocessed nuScenes caches (counterpart of the reference's
notebooks/explore_nuscenes.ipynb): sample stats, class histogram, BEV
scatter of LiDAR + GT boxes.

Usage: python examples/explore_nuscenes.py --cache datasets/nuscenes/preprocessed/train
"""
from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from automoe_tpu.data.datasets import NUSCENES_CLASSES, NuScenesDataset


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cache", required=True)
    p.add_argument("--out", default="examples_out")
    p.add_argument("--sample", type=int, default=0)
    args = p.parse_args(argv)

    ds = NuScenesDataset(args.cache, lidar_cap=60000, box_cap=128)
    print(f"{len(ds)} samples in {args.cache}")
    hist: Counter = Counter()
    for i in range(min(len(ds), 200)):
        s = ds[i]
        for lbl in s["labels"]:
            if lbl >= 0:
                hist[int(lbl)] += 1
    id2name = {v: k for k, v in NUSCENES_CLASSES.items()}
    print("class histogram (first 200 samples):")
    for cls, n in hist.most_common():
        print(f"  {id2name[cls]:22s} {n}")

    s = ds[args.sample]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(7, 7))
    pts = s["lidar"]
    pts = pts[np.abs(pts).sum(-1) > 0]
    ax.scatter(pts[:, 0], pts[:, 1], s=0.2, alpha=0.4)
    for box, lbl in zip(s["boxes"], s["labels"]):
        if lbl < 0:
            continue
        cx, cy, _, w, l, _, yaw = box
        c, sn = np.cos(yaw), np.sin(yaw)
        corners = np.array(
            [[-w / 2, -l / 2], [w / 2, -l / 2], [w / 2, l / 2], [-w / 2, l / 2],
             [-w / 2, -l / 2]]
        ) @ np.array([[c, -sn], [sn, c]]).T + [cx, cy]
        ax.plot(corners[:, 0], corners[:, 1], "r-", lw=1)
    ax.set_title(f"BEV sample {args.sample} ({s['token']})")
    ax.axis("equal")
    fig.savefig(out / "nuscenes_bev.png", dpi=150)
    print(f"wrote {out}/nuscenes_bev.png")


if __name__ == "__main__":
    main()
