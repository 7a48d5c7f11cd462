"""Tools-layer tests: BDD/CARLA preprocessing round trips, camera
projection geometry, packed sequence caches, cache invalidation."""
from __future__ import annotations

import json

import numpy as np
import pytest

from tests.torch_mirror import install_torchvision_stub

install_torchvision_stub()


def test_preprocess_bdd_detection_roundtrip(tmp_path, rng):
    from PIL import Image

    from automoe_tpu.data import get_bdd_detection_loader
    from automoe_tpu.tools.preprocess_bdd100k import process_detection

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    ann = []
    for i in range(3):
        name = f"im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
        ).save(img_root / name)
        ann.append(
            {
                "name": name,
                "attributes": {"scene": "city street", "weather": "clear"},
                "labels": [
                    {"category": "car",
                     "box2d": {"x1": 1, "y1": 2, "x2": 20, "y2": 25}},
                    {"category": "sky", "box2d": {"x1": 0, "y1": 0, "x2": 5, "y2": 5}},
                    {"category": "person", "poly2d": []},
                ],
            }
        )
    jf = tmp_path / "det_train.json"
    jf.write_text(json.dumps(ann))
    out = tmp_path / "pre" / "train"
    n = process_detection(jf, img_root, out)
    assert n == 3

    loader = get_bdd_detection_loader(
        split="train", root_dir=str(tmp_path / "pre"), batch_size=3,
        num_workers=1, shuffle=False, box_cap=4,
    )
    b = next(iter(loader))
    assert b["labels"][0, 0] == 2  # car
    assert (b["labels"][0, 1:] == -1).all()  # unknown category + poly dropped
    np.testing.assert_allclose(b["bboxes"][0, 0], [1, 2, 20, 25])


def make_raw_carla(raw, rng, runs=("run_001", "run_002"), n_frames=6):
    """Collector-output-format (S1) fixture: images/seg/annots/lidar +
    vehicle_log.json + config.json per run."""
    from PIL import Image

    for r in runs:
        run = raw / r
        (run / "images" / "front").mkdir(parents=True)
        (run / "segmentation" / "front").mkdir(parents=True)
        (run / "annots" / "front").mkdir(parents=True)
        (run / "lidar").mkdir(parents=True)
        frames = []
        for t in range(n_frames):
            fname = f"{t:06d}.png"
            Image.fromarray(
                rng.integers(0, 255, (600, 800, 3), dtype=np.uint8)
            ).save(run / "images" / "front" / fname)
            Image.fromarray(
                rng.integers(0, 20, (600, 800), dtype=np.uint8)
            ).save(run / "segmentation" / "front" / fname)
            (run / "annots" / "front" / f"{t:06d}.json").write_text(
                json.dumps({"boxes": [
                    {"bbox": [100, 100, 300, 280], "label": "vehicle"},
                    {"bbox": [10, 10, 20, 20], "label": "sign"},  # dropped
                ]})
            )
            np.save(run / "lidar" / f"{t:06d}.npy",
                    rng.normal(size=(30, 4)).astype(np.float32))
            frames.append(
                {
                    "frame": t,
                    "timestamp": 0.05 * t,
                    "image_filename": fname,
                    "location": {"x": float(t), "y": 0.0, "z": 0.0},
                    "rotation": {"pitch": 0.0, "yaw": 0.0, "roll": 0.0},
                    "velocity": {"x": 5.0, "y": 0.0, "z": 0.0},
                    "speed_kmh": 18.0,
                    "control": {"throttle": 0.5, "steer": 0.0, "brake": 0.0},
                    "traffic_density": {
                        "nearby_vehicles_50m": 2,
                        "total_npc_vehicles": 10,
                        "total_npc_walkers": 5,
                    },
                }
            )
        (run / "config.json").write_text(json.dumps({
            "run_id": r, "map": "Town01",
            "weather": {"cloudiness": 50.0, "precipitation": 0.0,
                        "wetness": 0.0, "fog_density": 10.0,
                        "sun_altitude_angle": 45.0},
        }))
        (run / "vehicle_log.json").write_text(json.dumps(frames))


def test_preprocess_carla_run_roundtrip(tmp_path, rng):
    from automoe_tpu.data import get_carla_sequence_loader
    from automoe_tpu.tools.preprocess_carla import main as preprocess_main

    raw = tmp_path / "raw"
    make_raw_carla(raw, rng)

    pre = tmp_path / "pre"
    preprocess_main(["--raw_dir", str(raw), "--out_dir", str(pre)])
    assert (pre / "train" / "run_001").exists()
    assert (pre / "val" / "run_002").exists()

    loader = get_carla_sequence_loader(
        split="train", root_dir=str(pre), batch_size=2, num_workers=1,
        shuffle=False, horizon=3,
    )
    b = next(iter(loader))
    assert b["image"].shape == (2, 256, 256, 3)
    # constant +x world motion with yaw 0 stays on ego axis 0 (rotation by
    # -yaw is identity), matching reference _world_to_ego_xy semantics
    np.testing.assert_allclose(b["waypoints"][0, :, 0], [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(b["waypoints"][0, :, 1], 0, atol=1e-5)
    np.testing.assert_allclose(b["context"][0, :5],
                               [0.5, 0.0, 0.0, 0.1, 0.75], atol=1e-6)
    np.testing.assert_allclose(b["context"][0, 5:], [2, 10, 5])

    # detection view of the same caches
    from automoe_tpu.data import get_carla_detection_loader

    det = get_carla_detection_loader(
        split="train", root_dir=str(pre), batch_size=2, num_workers=1,
        shuffle=False, box_cap=4,
    )
    bd = next(iter(det))
    np.testing.assert_allclose(
        bd["bboxes"][0, 0], [100 * 0.32, 100 * 256 / 600, 300 * 0.32, 280 * 256 / 600],
        rtol=1e-5,
    )
    assert bd["labels"][0, 0] == 0 and bd["labels"][0, 1] == -1


def test_camera_projection_geometry():
    from automoe_tpu.tools.camera import (
        box_world_vertices,
        build_camera_intrinsic,
        compute_2d_bbox,
        world_to_camera_matrix,
    )

    K = build_camera_intrinsic(800, 600, 90)
    assert K[0, 0] == pytest.approx(400.0)  # f = W/(2 tan(45°)) = 400
    # camera at origin facing +x; a box 10m ahead, centered on the axis
    w2c = world_to_camera_matrix([0, 0, 0], [0, 0, 0])
    verts = box_world_vertices([10, 0, 0], [1, 1, 1], [0, 0, 0])
    bb = compute_2d_bbox(verts, K, w2c, 800, 600)
    assert bb is not None
    x1, y1, x2, y2 = bb
    # symmetric around the principal point
    assert abs((x1 + x2) / 2 - 400) < 1e-3
    assert abs((y1 + y2) / 2 - 300) < 1e-3
    # 2m-wide box at ~10m with f=400 → ~2*400/ either 9 or 11 m depth
    assert 60 < (x2 - x1) < 95
    # box behind the camera → None
    verts_behind = box_world_vertices([-10, 0, 0], [1, 1, 1], [0, 0, 0])
    assert compute_2d_bbox(verts_behind, K, w2c, 800, 600) is None


def test_packed_sequence_matches_unpacked(tmp_path, rng):
    import torch

    from automoe_tpu.data.datasets import CarlaSequenceDataset
    from automoe_tpu.data.packed import PackedSequenceDataset, pack_carla_sequences
    from tests.test_data import _make_carla_frame

    split = tmp_path / "train"
    d = split / "run_001"
    d.mkdir(parents=True)
    for t in range(8):
        torch.save(_make_carla_frame(rng, frame_id=t), d / f"{t:04d}.pt")

    packed_dir = tmp_path / "packed"
    n = pack_carla_sequences(split, packed_dir, horizon=3)
    ref = CarlaSequenceDataset(split, horizon=3)
    packed = PackedSequenceDataset(packed_dir)
    assert n == len(ref) == len(packed)
    for i in (0, len(ref) - 1):
        a, b = ref[i], packed[i]
        np.testing.assert_allclose(a["waypoints"], b["waypoints"], atol=1e-5)
        np.testing.assert_allclose(a["speed"], b["speed"], atol=1e-5)
        np.testing.assert_allclose(a["image"], b["image"], atol=2e-3)  # f16
        np.testing.assert_allclose(a["context"], b["context"], atol=1e-6)
        assert a["meta"]["frame_id"] == b["meta"]["frame_id"]


def test_redo_preprocess(tmp_path):
    from automoe_tpu.tools.redo_preprocess import main as redo

    target = tmp_path / "datasets" / "carla" / "preprocessed"
    target.mkdir(parents=True)
    (target / "x.pt").write_bytes(b"1")
    redo(["carla", "--base", str(tmp_path), "--dry-run"])
    assert target.exists()
    redo(["carla", "--base", str(tmp_path)])
    assert not target.exists()
