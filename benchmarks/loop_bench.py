"""End-to-end Trainer-loop throughput: host loop + loader + H2D + device
step, with and without bounded-async dispatch (TrainConfig.max_inflight).

The reference loop host-syncs on loss.item() every step; on a tunneled
runtime that fetch costs ~30-45 ms — more than the device step. This
bench shows what the pipelined loop recovers. Synthetic in-memory
detection data; the device work is the real jitted fwd+bwd+AdamW step.

Usage: python benchmarks/loop_bench.py [--steps 20] [--batch-size 32]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import json
import tempfile
import time

import numpy as np


class SynthDetection:
    def __init__(self, n, image_size=256, cap=48, seed=0):
        rng = np.random.default_rng(seed)
        self.images = rng.normal(size=(8, image_size, image_size, 3)).astype(
            np.float32
        )
        self.bboxes = rng.uniform(0.1, 0.9, (8, cap, 4)).astype(np.float32)
        self.labels = np.where(
            np.arange(cap)[None] < 12, rng.integers(0, 10, (8, cap)), -1
        ).astype(np.int32)
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        j = i % 8
        return {
            "image": self.images[j],
            "bboxes": self.bboxes[j],
            "labels": self.labels[j],
        }


def run(max_inflight, steps, batch_size, image_size=256, steps_per_call=1):
    from automoe_tpu.data.loader import DataLoader
    from automoe_tpu.parallel.mesh import MeshSpec, make_mesh
    from automoe_tpu.train.loop import TrainConfig, Trainer
    from automoe_tpu.train.workloads import bdd_expert_workload

    ds = SynthDetection(steps * batch_size, image_size=image_size)
    loader = DataLoader(
        ds, batch_size=batch_size, shuffle=False, num_workers=2, prefetch=2
    )
    wl = bdd_expert_workload("detection", image_size=image_size, box_cap=48)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = TrainConfig(
            epochs=1,
            run_name=f"loopbench_{max_inflight}",
            ckpt_root=f"{tmp}/ckpt",
            runs_root=f"{tmp}/runs",
            log_every=10_000,  # keep logging fetches out of the timing
            max_inflight=max_inflight,
            steps_per_call=steps_per_call,
        )
        trainer = Trainer(wl, loader, loader, cfg, mesh=make_mesh(MeshSpec()))
        trainer.train_epoch(0)  # epoch 0: compile + warm
        t0 = time.perf_counter()
        trainer.train_epoch(1)
        dt = time.perf_counter() - t0
    return {
        "max_inflight": max_inflight,
        "steps_per_call": steps_per_call,
        "steps_per_sec": round(steps / dt, 2),
        "samples_per_sec": round(steps * batch_size / dt, 1),
        "ms_per_step": round(dt / steps * 1e3, 2),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--image-size", type=int, default=256)
    args = p.parse_args()
    import jax

    from automoe_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print(json.dumps({"device": str(jax.devices()[0])}))
    for mi, spc in ((0, 1), (2, 1), (2, 4)):
        print(json.dumps(run(mi, args.steps, args.batch_size,
                             image_size=args.image_size,
                             steps_per_call=spc)))
