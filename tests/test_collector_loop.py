"""Headless end-to-end drive of the CARLA collector loop via the fake
`carla` module (tests/carla_stub.py) — both the full S1 rig
(reference scripts/collect_autopilot_data.py) and the legacy RGB-only S2
mode (scripts/collect_autopilot_data_old.py)."""
import argparse
import json

import pytest

from tests.carla_stub import install


@pytest.fixture()
def carla_mod():
    mod = install()
    yield mod


def _args(tmp_path, **kw):
    base = dict(
        runs=1, duration=1.0, vehicles=3, walkers=0,
        output=str(tmp_path), save_every=5, legacy=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_collect_run_full_rig(tmp_path, carla_mod):
    from automoe_tpu.tools.collect_carla import collect_run

    client = carla_mod.Client()
    metrics = collect_run(client, 1, _args(tmp_path))
    run = tmp_path / "run_001"
    assert metrics["n_frames"] > 0
    assert list((run / "images/front").glob("*.png"))
    assert list((run / "segmentation/front").glob("*.png"))
    assert list((run / "lidar").glob("*.npy"))
    annots = sorted((run / "annots/front").glob("*.json"))
    assert annots and "boxes" in json.loads(annots[0].read_text())
    cfg = json.loads((run / "config.json").read_text())
    assert cfg["legacy_rgb_only"] is False
    log = json.loads((run / "vehicle_log.json").read_text())
    assert log[0]["speed_kmh"] == pytest.approx(18.0)  # 5 m/s stub velocity
    assert (run / "collisions.json").exists()
    # sim restored to async mode after the run
    assert client.get_world().get_settings().synchronous_mode is False


def test_carla_sim_backend_headless(carla_mod):
    from automoe_tpu.infer.carla_sim import CarlaSim

    sim = CarlaSim(camera_wh=(16, 12))
    try:
        sim.tick()
        frame = sim.camera_frame()
        assert frame.shape == (12, 16, 3) and frame.dtype == "uint8"
        # BGRA(10,20,30,255) → RGB(30,20,10)
        assert tuple(frame[0, 0]) == (30, 20, 10)
        assert sim.speed_kmh == pytest.approx(18.0)
        sim.apply_control(throttle=1.7, steer=-2.0, brake=0.5)
        ctrl = sim.vehicle.last_control
        assert (ctrl.throttle, ctrl.steer, ctrl.brake) == (1.0, -1.0, 0.5)
    finally:
        sim.close()
    assert sim.world.get_settings().synchronous_mode is False


def test_collect_run_legacy_rgb_only(tmp_path, carla_mod):
    from automoe_tpu.tools.collect_carla import CAMERA_RIG, collect_run

    client = carla_mod.Client()
    metrics = collect_run(client, 2, _args(tmp_path, legacy=True))
    run = tmp_path / "run_002"
    assert metrics["n_frames"] > 0
    for cam in CAMERA_RIG:
        assert list((run / "images" / cam).glob("*.png")), cam
    assert not (run / "lidar").exists()
    assert not (run / "annots/front").exists()
    assert not (run / "segmentation/front").exists()
    cfg = json.loads((run / "config.json").read_text())
    assert cfg["legacy_rgb_only"] is True


def test_collect_run_spawns_and_annotates_walkers(tmp_path, carla_mod):
    """Review r2: the collector previously never spawned the requested
    walkers, logged the REQUESTED counts instead of spawned ones, and
    annotated only vehicles — so the 'pedestrian' class (reference
    collect_autopilot_data.py:249-264, :407-413) never occurred."""
    from automoe_tpu.tools.collect_carla import collect_run

    client = carla_mod.Client()
    collect_run(client, 1, _args(tmp_path, walkers=2, vehicles=2))
    run = tmp_path / "run_001"
    labels = set()
    for f in (run / "annots/front").glob("*.json"):
        for b in json.loads(f.read_text())["boxes"]:
            labels.add(b["label"])
    assert "pedestrian" in labels, labels
    assert "vehicle" in labels
    log = json.loads((run / "vehicle_log.json").read_text())
    td = log[0]["traffic_density"]
    assert td["total_npc_walkers"] == 2  # actually spawned, not requested
    assert td["total_npc_vehicles"] == 2
