"""Inference subsystem tests: controller parity vs the actual reference
implementations, engine numerics, and the full closed loop on the mock sim.
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.torch_mirror import add_reference_to_path, install_torchvision_stub

install_torchvision_stub()
add_reference_to_path()

from automoe_tpu.infer.controllers import PID, brake_command, pure_pursuit_steer  # noqa: E402
from automoe_tpu.infer.sim import MockSim  # noqa: E402


@pytest.fixture(scope="module")
def ref_infer():
    import importlib

    return importlib.import_module("inference.run_automoe")


def test_pure_pursuit_parity(ref_infer, rng):
    for _ in range(20):
        wps = rng.normal(scale=5.0, size=(8, 2)).astype(np.float32)
        ours = pure_pursuit_steer(wps, lookahead_m=3.0)
        ref = ref_infer.pure_pursuit_steer(wps, lookahead_m=3.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    assert pure_pursuit_steer(np.zeros((0, 2))) == 0.0
    # behind/at origin → zero steer
    assert pure_pursuit_steer(np.array([[1.0, -2.0]])) == 0.0


def test_pid_parity(ref_infer):
    ours = PID(0.08, 0.01, 0.02)
    ref = ref_infer.PID(0.08, 0.01, 0.02)
    errs = [5.0, 3.0, 1.0, -1.0, 0.5, 2.0]
    for e in errs:
        np.testing.assert_allclose(ours.step(e, 0.05), ref.step(e, 0.05), rtol=1e-9)
    ours.reset(), ref.reset()
    np.testing.assert_allclose(ours.step(2.0, 0.05), ref.step(2.0, 0.05))


def test_brake_command():
    assert brake_command(5.0) == 0.0
    assert brake_command(-10.0) == 0.5
    assert brake_command(-100.0) == 1.0


def test_mock_sim_dynamics():
    sim = MockSim(fixed_dt=0.05, camera_hw=(120, 160))
    sim.apply_control(throttle=1.0, steer=0.0, brake=0.0)
    for _ in range(40):
        sim.tick()
    assert sim.speed_kmh > 5.0
    frame = sim.camera_frame()
    assert frame.shape == (120, 160, 3) and frame.dtype == np.uint8
    sim.apply_control(throttle=0.0, steer=0.0, brake=1.0)
    for _ in range(60):
        sim.tick()
    assert sim.speed_kmh < 1.0


@pytest.mark.slow
def test_closed_loop_mock(tmp_path):
    """Full perceive→plan→act loop with a tiny AutoMoE on the mock sim."""
    from automoe_tpu.infer.engine import InferenceEngine
    from automoe_tpu.infer.run_automoe import run_closed_loop

    cfg = {
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    engine = InferenceEngine(cfg, camera_hw=(120, 160), model_hw=(64, 64))
    sim = MockSim(fixed_dt=0.05, camera_hw=(120, 160))
    logs = run_closed_loop(
        engine, sim, steps=12, out_dir=str(tmp_path), save_frames=True,
        record_every=4,
    )
    assert len(logs) == 12
    assert (tmp_path / "log.json").exists()
    assert len(list((tmp_path / "frames").glob("*.jpg"))) == 3
    for l in logs:
        assert np.isfinite([l["steer"], l["throttle"], l["brake"]]).all()
        assert 0 <= l["throttle"] <= 1 and -1 <= l["steer"] <= 1
