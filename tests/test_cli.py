"""End-to-end CLI tests over synthetic reference-format caches."""
from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.torch_mirror import install_torchvision_stub

install_torchvision_stub()

from automoe_tpu.train.cli import main as train_main  # noqa: E402
from tests.test_data import _make_carla_frame  # noqa: E402


@pytest.fixture(scope="module")
def carla_root(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("carla_cli")
    for split in ("train", "val"):
        for run in ("run_001",):
            d = root / split / run
            d.mkdir(parents=True)
            for t in range(10):
                torch.save(
                    _make_carla_frame(rng, frame_id=t, run_id=run),
                    d / f"{t:04d}.pt",
                )
    return root


def test_policy_dry_run(capsys):
    out = train_main([
        "policy", "--epochs", "0", "--horizon", "4", "--image-size", "32",
        "--no-mesh",
    ])
    assert out == {"dry_run": True}
    printed = capsys.readouterr().out
    assert "waypoints" in printed


def test_finetune_carla_drivable_one_epoch(carla_root, tmp_path):
    out = train_main([
        "finetune-carla", "--task", "drivable",
        "--data-root", str(carla_root),
        "--epochs", "1", "--batch-size", "4", "--num-workers", "1",
        "--image-size", "32", "--no-mesh",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--run-name", "cli_test",
    ])
    assert np.isfinite(out["best_val_loss"])
    assert (tmp_path / "ckpt" / "bdd_drivable" / "cli_test" / "best").exists()


def test_policy_one_epoch(carla_root, tmp_path):
    out = train_main([
        "policy", "--horizon", "4",
        "--data-root", str(carla_root),
        "--epochs", "1", "--batch-size", "2", "--num-workers", "1",
        "--image-size", "32", "--no-mesh",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(out["best_val_loss"])


@pytest.mark.slow
def test_gating_ep_one_epoch(carla_root, tmp_path):
    """`gating --parallelism ep` trains through the real Trainer on the
    2x4 virtual mesh (one expert per 'model'-axis device) — VERDICT r1 #3."""
    import json

    model_cfg = {
        "experts": [
            {"type": "detection", "num_classes": 10},
            {"type": "segmentation", "num_classes": 19},
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(json.dumps(model_cfg))
    out = train_main([
        "gating", "--parallelism", "ep",
        "--model-config", str(cfg_path),
        "--data-root", str(carla_root),
        "--epochs", "1", "--batch-size", "4", "--num-workers", "1",
        "--image-size", "32",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--run-name", "ep_test",
    ])
    assert np.isfinite(out["best_val_loss"])
    assert (tmp_path / "ckpt" / "gating_ep" / "ep_test" / "best").exists()


def test_preset_expansion(carla_root, tmp_path):
    """`preset quick_test` runs a 1-epoch drivable train via the preset
    config layer (replacement for the reference's per-run JSON configs)."""
    import json

    preset = tmp_path / "p.json"
    preset.write_text(json.dumps({
        "pipeline": "finetune-carla", "task": "drivable", "epochs": 1,
        "batch_size": 4, "image_size": 32, "run_name": "preset_test",
    }))
    out = train_main([
        "preset", str(preset),
        "--data-root", str(carla_root),
        "--num-workers", "1", "--no-mesh",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
    ])
    assert np.isfinite(out["best_val_loss"])
    assert (tmp_path / "ckpt" / "bdd_drivable" / "preset_test" / "best").exists()


def test_preset_list(capsys):
    """`preset --list` prints the shipped preset names (r3 fix: it used
    to be parsed as a preset NAME and crash on '--list.json')."""
    with pytest.raises(SystemExit) as ei:
        train_main(["preset", "--list"])
    assert ei.value.code == 0
    out = capsys.readouterr().out.split()
    assert "quick_test" in out and "nuscenes_v5e" in out


def test_finetune_carla_spatial_one_epoch(carla_root, tmp_path):
    """--spatial --model-axis 4: CLI → Trainer → height-sharded batches +
    gather interceptor, end-to-end on the 2x4 CPU mesh."""
    out = train_main([
        "finetune-carla", "--task", "drivable",
        "--data-root", str(carla_root),
        "--epochs", "1", "--batch-size", "4", "--num-workers", "1",
        "--image-size", "32", "--spatial", "--model-axis", "4",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--run-name", "cli_sp",
    ])
    assert np.isfinite(out["best_val_loss"])


def test_finetune_carla_tp_one_epoch(carla_root, tmp_path):
    """--tp-min-dim 128 --model-axis 2: wide kernels sharded over 'model'
    through the CLI path."""
    out = train_main([
        "finetune-carla", "--task", "drivable",
        "--data-root", str(carla_root),
        "--epochs", "1", "--batch-size", "4", "--num-workers", "1",
        "--image-size", "32", "--tp-min-dim", "128", "--model-axis", "2",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--run-name", "cli_tp",
    ])
    assert np.isfinite(out["best_val_loss"])


def test_spatial_cli_guards():
    # guards live in _mesh (cmd_* call it before building the Trainer);
    # exercised directly because `--epochs 0` dry-runs return earlier
    import argparse

    from automoe_tpu.train.cli import _mesh

    def ns(**kw):
        base = dict(no_mesh=False, spatial=False, tp_min_dim=0, model_axis=1)
        base.update(kw)
        return argparse.Namespace(**base)

    with pytest.raises(SystemExit, match="mesh"):
        _mesh(ns(no_mesh=True, spatial=True))
    with pytest.raises(SystemExit, match="model-axis"):
        _mesh(ns(spatial=True, model_axis=1))
    with pytest.raises(SystemExit, match="model-axis"):
        _mesh(ns(tp_min_dim=128, model_axis=1))
    with pytest.raises(SystemExit, match="exclusive"):
        _mesh(ns(spatial=True, tp_min_dim=128, model_axis=4))
