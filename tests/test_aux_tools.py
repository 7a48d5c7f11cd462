"""Launcher, checks, eval-CLI, and profiling-hook tests."""
from __future__ import annotations

import json

import numpy as np
import pytest
import torch

from tests.torch_mirror import install_torchvision_stub

install_torchvision_stub()

from tests.test_data import _make_carla_frame  # noqa: E402


@pytest.fixture(scope="module")
def carla_root(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("carla_aux")
    for split in ("train", "val"):
        d = root / split / "run_001"
        d.mkdir(parents=True)
        for t in range(12):
            torch.save(_make_carla_frame(rng, frame_id=t), d / f"{t:04d}.pt")
    return root


def test_launcher_runs_policy_gating(carla_root, tmp_path, monkeypatch):
    from automoe_tpu.tools.launch import main as launch

    monkeypatch.setenv("SKIP_GATING", "1")  # gating compile is heavy; policy only
    launch([
        "policy-gating",
        "--epochs", "1", "--batch-size", "2",
        "--data-root", str(carla_root),
        "--run-name", "launchtest",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--log-dir", str(tmp_path / "logs"),
        "--no-mesh",
    ])
    assert (tmp_path / "ckpt" / "carla_policy" / "launchtest" / "best").exists()


def test_checks_tpu_and_missing_sims(tmp_path):
    from automoe_tpu.tools.checks import check_carla, check_nuscenes, check_tpu

    tpu = check_tpu()
    assert tpu["n_devices"] >= 1 and tpu["matmul_ok"]

    nus = check_nuscenes(str(tmp_path / "nope"), "v1.0-mini")
    assert nus["exists"] is False

    car = check_carla("127.0.0.1", 2000)
    assert car["client_installed"] is False  # no carla wheel in this image


def test_eval_cli_gating(carla_root, tmp_path):
    from automoe_tpu.evals.cli import main as eval_main

    res = eval_main([
        "gating",
        "--model-config", json.dumps({
            "experts": [
                {"type": "drivable", "num_classes": 3},
                {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
                 "fusion": "sum", "use_lidar": False},
            ],
            "gating": {"top_k": 0, "noise_scale": 0.0},
            "context": {"type": "simple"},
            "policy": {"num_waypoints": 4},
        }),
        "--data-root", str(carla_root),
        "--batch-size", "2", "--num-workers", "1",
        "--image-size", "32",
        "--out-dir", str(tmp_path / "eval_out"),
    ])
    for key in ("ade_l1", "fde_euclid", "entropy", "expert_usage"):
        assert key in res
    results = list((tmp_path / "eval_out" / "results").glob("gating_*.json"))
    assert len(results) == 1
    assert (tmp_path / "eval_out" / "vis" / "expert_usage.png").exists()
    assert "correlation" in res


def test_eval_cli_gating_quantized(carla_root, tmp_path):
    """--quantize evaluates through the int8 PTQ serving path and reports
    metrics in the same schema (PTQ accuracy-validation workflow)."""
    from automoe_tpu.evals.cli import main as eval_main

    res = eval_main([
        "gating", "--quantize",
        "--model-config", json.dumps({
            "experts": [
                {"type": "drivable", "num_classes": 3},
                {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
                 "fusion": "sum", "use_lidar": False},
            ],
            "gating": {"top_k": 0, "noise_scale": 0.0},
            "context": {"type": "simple"},
            "policy": {"num_waypoints": 4},
        }),
        "--data-root", str(carla_root),
        "--batch-size", "2", "--num-workers", "1",
        "--image-size", "32",
        "--out-dir", str(tmp_path / "eval_q"),
    ])
    assert res["quantized"] is True
    assert np.isfinite(res["ade_l1"])


def test_step_timer():
    import time

    from automoe_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.002)
        t.stop()
    s = t.stats()
    assert s["step_ms_p50"] >= 1.5
    assert s["steps_per_sec"] > 0


def test_shared_bench_watchdog_healthy_path():
    """benchmarks/watchdog.init_watchdog (the shared backend-init wedge
    guard) returns the device list and cancels its timer on a healthy
    backend — the import path bench.py/the soak/sustained benches rely
    on."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from benchmarks.watchdog import init_watchdog

    devs = init_watchdog(timeout_s=120)
    assert len(devs) >= 1
