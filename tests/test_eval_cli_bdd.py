"""Eval CLI coverage: bdd seg/detection subcommands + visualizer on
synthetic CARLA caches."""
from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.torch_mirror import install_torchvision_stub

install_torchvision_stub()

from automoe_tpu.evals.cli import main as eval_main  # noqa: E402
from tests.test_data import _make_carla_frame  # noqa: E402


@pytest.fixture(scope="module")
def carla_root(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("carla_evalcli")
    d = root / "val" / "run_001"
    d.mkdir(parents=True)
    for t in range(6):
        torch.save(_make_carla_frame(rng, frame_id=t, size=64), d / f"{t:04d}.pt")
    return root


def test_eval_cli_bdd_drivable_on_carla(carla_root, tmp_path):
    res = eval_main([
        "bdd", "--task", "drivable", "--source", "carla",
        "--data-root", str(carla_root),
        "--batch-size", "3", "--num-workers", "1", "--image-size", "32",
        "--out-dir", str(tmp_path / "out"),
    ])
    for key in ("val_loss", "pixel_acc", "mean_iou"):
        assert key in res and np.isfinite(res[key])
    assert list((tmp_path / "out" / "results").glob("carla_drivable_*.json"))


def test_eval_cli_detection_and_visualizer(carla_root, tmp_path):
    res = eval_main([
        "bdd", "--task", "detection", "--source", "carla",
        "--data-root", str(carla_root),
        "--batch-size", "3", "--num-workers", "1", "--image-size", "64",
        "--box-cap", "4",
        "--out-dir", str(tmp_path / "out"),
    ])
    for key in ("val_loss", "avg_iou", "recall_0.5"):
        assert key in res

    table = eval_main([
        "visualize-detection", "--source", "carla",
        "--data-root", str(carla_root),
        "--batch-size", "3", "--num-workers", "1", "--image-size", "64",
        "--box-cap", "4", "--max-images", "4",
        "--out-dir", str(tmp_path / "vis_out"),
    ])
    assert len(table) == 4
    imgs = list((tmp_path / "vis_out" / "vis").glob("det_*.jpg"))
    assert len(imgs) == 4


def test_eval_cli_bdd_quantize(carla_root, tmp_path):
    """`bdd --quantize` (VERDICT r2 #5) runs the same eval through the
    int8 serving trunk and tracks the bf16 numbers."""
    common = [
        "bdd", "--task", "drivable", "--source", "carla",
        "--data-root", str(carla_root),
        "--batch-size", "3", "--num-workers", "1", "--image-size", "32",
        "--out-dir", str(tmp_path / "out"),
    ]
    bf = eval_main(common)
    q8 = eval_main(common + ["--quantize"])
    assert q8["quantized"] and not bf["quantized"]
    for key in ("pixel_acc", "mean_iou"):
        assert np.isfinite(q8[key])
        assert abs(q8[key] - bf[key]) < 0.05, (key, bf[key], q8[key])
