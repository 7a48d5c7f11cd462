"""One-command full-spine smoke: raw collector output → preprocess →
launch.py policy+gating training → eval CLI → closed-loop MockSim.

The reference's end-to-end story is a chain of bash launchers + scripts
(SURVEY.md §1 L0→L6); this exercises the whole spine in one pytest on
synthetic fixtures (VERDICT r1 #10). Image size is shrunk via the
preprocess OUT_SIZE knob to keep CPU compile times sane.
"""
from __future__ import annotations

import json

import numpy as np
import pytest

from tests.torch_mirror import install_torchvision_stub

install_torchvision_stub()

from tests.test_tools import make_raw_carla  # noqa: E402

MODEL_CFG = {
    "experts": [
        {"type": "drivable", "num_classes": 3},
        {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
         "fusion": "sum", "use_lidar": False},
    ],
    "gating": {"top_k": 0, "noise_scale": 0.0},
    "context": {"type": "simple"},
    "policy": {"num_waypoints": 4},
}


@pytest.mark.slow
def test_full_pipeline_spine(tmp_path, rng, monkeypatch):
    import automoe_tpu.tools.preprocess_carla as prep
    from automoe_tpu.evals.cli import main as eval_main
    from automoe_tpu.tools.launch import main as launch

    # --- L0 fixture (collector output format) + L1 preprocess at 64² ---
    monkeypatch.setattr(prep, "OUT_SIZE", 64)
    raw = tmp_path / "raw"
    make_raw_carla(raw, rng, n_frames=8)
    pre = tmp_path / "pre"
    prep.main(["--raw_dir", str(raw), "--out_dir", str(pre)])
    assert (pre / "train" / "run_001").exists()
    # run_002 lands in val; gating/policy val loaders need sequences too
    assert (pre / "val" / "run_002").exists()

    # --- L2-L4: policy then gating through the orchestrator ---
    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(json.dumps(MODEL_CFG))
    launch([
        "policy-gating",
        "--epochs", "1", "--batch-size", "2", "--num-workers", "1",
        "--data-root", str(pre),
        "--image-size", "64", "--horizon", "4",
        "--model-config", str(cfg_path),
        "--run-name", "spine",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--log-dir", str(tmp_path / "logs"),
        "--no-mesh",
    ])
    gating_ckpt = tmp_path / "ckpt" / "gating" / "spine" / "best"
    assert (tmp_path / "ckpt" / "carla_policy" / "spine" / "best").exists()
    assert gating_ckpt.exists()

    # --- L6: gating eval CLI over the trained checkpoint ---
    res = eval_main([
        "gating", "--model-config", str(cfg_path),
        "--checkpoint", str(gating_ckpt),
        "--data-root", str(pre), "--split", "val",
        "--batch-size", "2", "--num-workers", "1", "--image-size", "64",
        "--out-dir", str(tmp_path / "eval_out"),
    ])
    assert np.isfinite(res["ade_l1"])
    assert (tmp_path / "eval_out" / "vis" / "expert_usage.png").exists()

    # training-curves artifact from the gating run's metrics.jsonl
    eval_main([
        "training-curves",
        "--run-dir", str(tmp_path / "runs" / "gating_spine"),
    ])
    assert (tmp_path / "runs" / "gating_spine" / "training_curves.png").exists()

    # --- L5: closed loop on MockSim with the TRAINED gating weights ---
    import jax.numpy as jnp

    from automoe_tpu.evals.cli import _load_state
    from automoe_tpu.infer.engine import InferenceEngine
    from automoe_tpu.infer.run_automoe import run_closed_loop
    from automoe_tpu.infer.sim import MockSim
    from automoe_tpu.train.workloads import gating_workload

    wl = gating_workload(MODEL_CFG, image_size=64)
    variables = _load_state(wl, str(gating_ckpt))
    engine = InferenceEngine(
        MODEL_CFG, variables=variables, camera_hw=(120, 160),
        model_hw=(64, 64), dtype=jnp.float32,
    )
    sim = MockSim(fixed_dt=0.05, camera_hw=(120, 160))
    logs = run_closed_loop(
        engine, sim, steps=6, out_dir=str(tmp_path / "loop"),
    )
    assert len(logs) == 6
    for l in logs:
        assert np.isfinite([l["steer"], l["throttle"], l["brake"]]).all()
