"""End-to-end trainer loop + checkpoint/resume tests (synthetic data)."""
from __future__ import annotations

import json

import jax
import numpy as np
import pytest

from automoe_tpu.data.loader import DataLoader
from automoe_tpu.train.loop import TrainConfig, Trainer
from automoe_tpu.train.workloads import bdd_expert_workload


class SyntheticSegDataset:
    def __init__(self, n=12, size=32, classes=3, seed=0):
        rng = np.random.default_rng(seed)
        self.samples = [
            {
                "image": rng.normal(size=(size, size, 3)).astype(np.float32),
                "mask": rng.integers(0, classes, (size, size)).astype(np.int32),
            }
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def _make_trainer(tmp_path, epochs=2, resume=None, resume_from="last"):
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(SyntheticSegDataset(8), batch_size=4, num_workers=1, shuffle=True)
    val = DataLoader(
        SyntheticSegDataset(4, seed=1), batch_size=4, num_workers=1,
        shuffle=False, drop_last=False,
    )
    cfg = TrainConfig(
        epochs=epochs,
        learning_rate=1e-3,
        run_name="t",
        ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"),
        save_freq=1,
        resume=resume,
        resume_from=resume_from,
        log_every=1,
    )
    return Trainer(wl, train, val, cfg)


def test_trainer_fit_and_artifacts(tmp_path):
    tr = _make_trainer(tmp_path, epochs=2)
    out = tr.fit(config_dump={"note": "test"})
    assert np.isfinite(out["best_val_loss"])
    ckpt_dir = tmp_path / "ckpt" / "bdd_drivable" / "t"
    assert (ckpt_dir / "best").exists()
    assert (ckpt_dir / "last").exists()
    assert (ckpt_dir / "epoch_1").exists()
    assert (ckpt_dir / "config.json").exists()
    jsonl = tmp_path / "runs" / "bdd_drivable_t" / "metrics.jsonl"
    lines = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert any("train/loss" in l for l in lines)
    assert any("val/loss" in l for l in lines)

    # resume 'full' restores step + optimizer position
    tr2 = _make_trainer(tmp_path, epochs=3, resume="full", resume_from="last")
    assert int(tr2.state.step) == 4  # 2 epochs x 2 steps
    assert tr2.start_epoch == 2

    # resume 'model' restores weights only
    tr3 = _make_trainer(tmp_path, epochs=1, resume="model", resume_from="best")
    assert int(tr3.state.step) == 0
    p_restored = jax.tree.leaves(tr3.state.params)[0]
    p_saved = jax.tree.leaves(tr2.state.params)[0]
    assert p_restored.shape == p_saved.shape
