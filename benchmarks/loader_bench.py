"""Host data-pipeline benchmark: reference-format per-frame .pt reads vs
the packed memmap sequence cache (automoe_tpu/data/packed.py).

Quantifies the I/O-amplification fix: the reference CarlaSequenceDataset
re-globs the run dir and torch.loads H+1 full frames per sample
(dataloaders/carla_sequence_loader.py:95-104).

Usage: python benchmarks/loader_bench.py  (builds synthetic data in /tmp)
"""
from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build_synthetic_split(root: Path, n_runs=2, frames_per_run=120):
    import torch

    rng = np.random.default_rng(0)
    for r in range(n_runs):
        d = root / f"run_{r:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for t in range(frames_per_run):
            torch.save(
                {
                    "image": torch.from_numpy(
                        rng.normal(size=(3, 256, 256)).astype(np.float32)
                    ),
                    "vehicle_state": {
                        "location": torch.tensor([float(t), 0.0, 0.0]),
                        "rotation": torch.tensor([0.0, 0.0, 0.0]),
                        "speed_kmh": torch.tensor(20.0),
                        "control": torch.tensor([0.5, 0.0, 0.0]),
                    },
                    "context": {
                        "weather": torch.zeros(5),
                        "traffic_density": torch.zeros(3),
                    },
                    "meta": {"run_id": f"run_{r:03d}", "frame_id": t},
                },
                d / f"{t:05d}.pt",
            )


def bench(ds, n=200, label=""):
    idx = np.random.default_rng(1).integers(0, len(ds), n)
    _ = ds[0]
    t0 = time.perf_counter()
    for i in idx:
        _ = ds[int(i)]
    dt = time.perf_counter() - t0
    return {"dataset": label, "samples_per_sec": round(n / dt, 1),
            "ms_per_sample": round(dt / n * 1e3, 3)}


def bench_batched(ds, batch_size=32, n_batches=16, label=""):
    rng = np.random.default_rng(1)
    ds.read_batch(rng.integers(0, len(ds), batch_size))  # warm
    t0 = time.perf_counter()
    for _ in range(n_batches):
        ds.read_batch(rng.integers(0, len(ds), batch_size))
    dt = time.perf_counter() - t0
    n = batch_size * n_batches
    return {"dataset": label, "samples_per_sec": round(n / dt, 1),
            "ms_per_batch": round(dt / n_batches * 1e3, 3),
            "batch_size": batch_size}


def main():
    from automoe_tpu.data.datasets import CarlaSequenceDataset
    from automoe_tpu.data.packed import PackedSequenceDataset, pack_carla_sequences

    with tempfile.TemporaryDirectory() as tmp:
        split = Path(tmp) / "train"
        build_synthetic_split(split)
        ds_pt = CarlaSequenceDataset(split, horizon=8, frame_cache_size=0)
        ds_cached = CarlaSequenceDataset(split, horizon=8, frame_cache_size=512)
        packed_dir = Path(tmp) / "packed"
        pack_carla_sequences(split, packed_dir, horizon=8)
        ds_packed = PackedSequenceDataset(packed_dir)

        print(json.dumps(bench(ds_pt, label="pt_per_frame (reference-style)")))
        print(json.dumps(bench(ds_cached, label="pt_with_lru_cache")))
        print(json.dumps(bench(ds_packed, label="packed_memmap")))
        # whole-batch gather paths (what the DataLoader actually uses)
        print(json.dumps(bench_batched(
            ds_packed, label="packed_memmap read_batch (python)")))
        try:
            from automoe_tpu.data.native_packed import NativePackedDataset

            ds_native = NativePackedDataset(packed_dir)
            print(json.dumps(bench_batched(
                ds_native, label="packed native C++ reader")))
        except Exception as e:  # g++ unavailable
            print(json.dumps({"dataset": "packed native C++ reader",
                              "skipped": str(e)}))


if __name__ == "__main__":
    main()
