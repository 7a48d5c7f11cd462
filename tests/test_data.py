"""Data-layer round-trip tests on synthetic reference-format caches.

Fixtures are written in the reference's `.pt` schemas; our loaders read
them and (where feasible) outputs are compared against the actual
reference dataloaders running on the same files.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.torch_mirror import add_reference_to_path, install_torchvision_stub

install_torchvision_stub()
add_reference_to_path()

from automoe_tpu.data import (  # noqa: E402
    DataLoader,
    get_bdd_detection_loader,
    get_carla_detection_loader,
    get_carla_drivable_loader,
    get_carla_segmentation_loader,
    get_carla_sequence_loader,
    get_nuscenes_loader,
)
from automoe_tpu.data.loader import ShardedSampler  # noqa: E402


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def bdd_det_root(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("bdd_det")
    split = root / "train"
    split.mkdir()
    imgdir = root / "imgs"
    imgdir.mkdir()
    for i in range(6):
        img_path = imgdir / f"{i}.png"
        _write_png(img_path, rng.integers(0, 255, (40, 60, 3), dtype=np.uint8))
        n = int(rng.integers(0, 5))
        torch.save(
            {
                "image_path": str(img_path),
                "bboxes": torch.rand(n, 4) * 50,
                "labels": torch.randint(0, 10, (n,)),
            },
            split / f"{i:05d}.pt",
        )
    return root


def test_bdd_detection_roundtrip_vs_reference(bdd_det_root):
    import dataloaders.bdd_detection_loader as ref_mod

    ours = get_bdd_detection_loader(
        split="train", root_dir=str(bdd_det_root), batch_size=3,
        num_workers=2, shuffle=False, box_cap=8,
    )
    batches = list(ours)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (3, 40, 60, 3)
    assert b["bboxes"].shape == (3, 8, 4)
    assert b["labels"].shape == (3, 8)

    ref_ds = ref_mod.BDD100KDetectionDataset(str(bdd_det_root / "train"))
    for i in range(3):
        ref_s = ref_ds[i]
        ours_img = b["image"][i]
        ref_img = ref_s["image"].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours_img, ref_img, atol=1e-6)
        n = ref_s["labels"].shape[0]
        np.testing.assert_allclose(b["bboxes"][i, :n], ref_s["bboxes"].numpy())
        np.testing.assert_array_equal(b["labels"][i, :n], ref_s["labels"].numpy())
        assert (b["labels"][i, n:] == -1).all()


def _make_carla_frame(rng, with_boxes=True, frame_id=0, run_id="run_001",
                      size=32):
    frame = {
        "image": torch.from_numpy(
            rng.normal(size=(3, size, size)).astype(np.float32)
        ),
        "mask": torch.from_numpy(
            rng.integers(0, 12, (size, size)).astype(np.int64)
        ),
        "lidar": torch.from_numpy(rng.normal(size=(20, 3)).astype(np.float32)),
        "vehicle_state": {
            "location": torch.tensor(
                [float(frame_id), float(frame_id) * 0.5, 0.0]
            ),
            "rotation": torch.tensor([0.0, 30.0, 0.0]),  # yaw=30deg
            "speed_kmh": torch.tensor(10.0 + frame_id),
            "control": torch.tensor([0.5, 0.1, 0.0]),
        },
        "context": {
            "weather": torch.from_numpy(rng.random(5).astype(np.float32)),
            "traffic_density": torch.from_numpy(rng.random(3).astype(np.float32)),
        },
        "meta": {"run_id": run_id, "frame_id": frame_id},
    }
    if with_boxes:
        n = int(rng.integers(0, 4))
        frame["bboxes"] = torch.rand(n, 4) * 30
        frame["labels"] = torch.randint(0, 10, (n,))
    return frame


@pytest.fixture(scope="module")
def carla_root(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("carla")
    for split in ("train", "val"):
        for run in ("run_001", "run_002"):
            d = root / split / run
            d.mkdir(parents=True)
            for t in range(8):
                torch.save(
                    _make_carla_frame(rng, frame_id=t, run_id=run),
                    d / f"{t:04d}.pt",
                )
    return root


def test_carla_sequence_vs_reference(carla_root):
    import dataloaders.carla_sequence_loader as ref_mod

    ours = get_carla_sequence_loader(
        split="train", root_dir=str(carla_root), batch_size=2,
        num_workers=1, shuffle=False, horizon=4,
    )
    ref_ds = ref_mod.CarlaSequenceDataset(
        split="train", root_dir=str(carla_root), horizon=4
    )
    batch = next(iter(ours))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["waypoints"].shape == (2, 4, 2)
    assert batch["context"].shape == (2, 8)
    for i in range(2):
        ref_s = ref_ds[i]
        np.testing.assert_allclose(
            batch["waypoints"][i], ref_s["waypoints"].numpy(), atol=1e-5
        )
        np.testing.assert_allclose(batch["speed"][i], ref_s["speed"].numpy())
        np.testing.assert_allclose(batch["throttle"][i], ref_s["throttle"].numpy())
        np.testing.assert_allclose(batch["steering"][i], ref_s["steering"].numpy())
        np.testing.assert_allclose(
            batch["context"][i], ref_s["context"].numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            batch["image"][i], ref_s["image"].permute(1, 2, 0).numpy(), atol=1e-6
        )


def test_carla_detection_and_seg_and_drivable(carla_root):
    det = get_carla_detection_loader(
        split="val", root_dir=str(carla_root), batch_size=4, num_workers=1,
        shuffle=False, box_cap=8,
    )
    b = next(iter(det))
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["bboxes"].shape == (4, 8, 4)

    seg = get_carla_segmentation_loader(
        split="val", root_dir=str(carla_root), batch_size=4, num_workers=1,
        shuffle=False,
    )
    bs = next(iter(seg))
    assert bs["mask"].shape == (4, 32, 32)
    assert bs["mask"].dtype == np.int32

    drv = get_carla_drivable_loader(
        split="val", root_dir=str(carla_root), batch_size=4, num_workers=1,
        shuffle=False, drivable_ids=[7], alternative_ids=[3],
    )
    bd = next(iter(drv))
    assert set(np.unique(bd["mask"])).issubset({0, 1, 2})


def test_carla_seg_sanitizes_raw_ids(carla_root):
    """CARLA seg caches hold RAW simulator IDs; anything outside
    [0, num_classes) must become ignore-255 (the reference sanitizes at
    loss time, train_carla_bdd_experts_ddp.py:132-138 — out-of-range
    labels reaching masked CE would be clamped into wrong gradients,
    not ignored)."""
    seg = get_carla_segmentation_loader(
        split="val", root_dir=str(carla_root), batch_size=4, num_workers=1,
        shuffle=False, num_classes=3,
    )
    bs = next(iter(seg))
    m = bs["mask"]
    assert ((m >= 0) & ((m < 3) | (m == 255))).all(), np.unique(m)
    # the fixture masks contain IDs >= 3 (raw CARLA range), so the
    # sanitizer must actually have fired
    assert (m == 255).any()


def test_carla_drivable_matches_reference_remap(carla_root):
    import dataloaders.carla_drivable_loader as ref_mod

    ref_ds = ref_mod.CarlaDrivableDataset(
        split="val", root_dir=str(carla_root), drivable_ids=[7], alternative_ids=[3]
    )
    ours = get_carla_drivable_loader(
        split="val", root_dir=str(carla_root), batch_size=1, num_workers=1,
        shuffle=False, drivable_ids=[7], alternative_ids=[3],
    )
    b = next(iter(ours))
    ref_s = ref_ds[0]
    np.testing.assert_array_equal(b["mask"][0], ref_s["mask"].numpy())


from tests.torch_mirror import FakeBox as _FakeBox


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("nusc")
    split = root / "train"
    split.mkdir()
    for i in range(4):
        boxes = [
            _FakeBox([1.0, 2.0, 0.5], [2.0, 4.5, 1.8], 0.3, "vehicle.car"),
            _FakeBox([5.0, 1.0, 0.5], [0.6, 0.6, 1.7], 0.0, "human.pedestrian.adult"),
            _FakeBox([9.9, 9.9, 0.5], [1, 1, 1], 0.0, "static.unknown"),  # dropped
        ]
        torch.save(
            {
                "image": torch.from_numpy(rng.normal(size=(3, 32, 32)).astype(np.float32)),
                "lidar": torch.from_numpy(rng.normal(size=(50, 3)).astype(np.float32)),
                "intrinsics": torch.eye(3),
                "boxes": boxes,
                "token": f"tok{i}",
            },
            split / f"{i:05d}.pt",
        )
    return root


def test_nuscenes_loader(nusc_root):
    loader = get_nuscenes_loader(
        split="train", root_dir=str(nusc_root), batch_size=2, num_workers=1,
        shuffle=False, lidar_cap=64, box_cap=8,
    )
    b = next(iter(loader))
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["lidar"].shape == (2, 64, 3)
    assert b["boxes"].shape == (2, 8, 7)
    # two valid boxes per sample; the unknown class is dropped
    assert (b["labels"][:, :2] >= 0).all() and (b["labels"][:, 2:] == -1).all()
    assert b["labels"][0, 0] == 0 and b["labels"][0, 1] == 5
    np.testing.assert_allclose(b["boxes"][0, 0], [1, 2, 0.5, 2, 4.5, 1.8, 0.3])
    # padded lidar rows are zero
    assert (b["lidar"][:, 50:] == 0).all()


def test_sharded_sampler_partition():
    s0 = ShardedSampler(100, shuffle=True, seed=7, num_shards=4, shard_index=0,
                        batch_size=5)
    s1 = ShardedSampler(100, shuffle=True, seed=7, num_shards=4, shard_index=1,
                        batch_size=5)
    s0.set_epoch(3), s1.set_epoch(3)
    i0 = [i for b, _ in s0 for i in b]
    i1 = [i for b, _ in s1 for i in b]
    assert len(i0) == len(i1) == 25
    assert not set(i0) & set(i1)
    # same epoch → deterministic
    s0b = ShardedSampler(100, shuffle=True, seed=7, num_shards=4, shard_index=0,
                         batch_size=5)
    s0b.set_epoch(3)
    assert [i for b, _ in s0b for i in b] == i0
    # different epoch → different order
    s0b.set_epoch(4)
    assert [i for b, _ in s0b for i in b] != i0


@pytest.mark.parametrize("drop_last", [True, False])
@pytest.mark.parametrize("n,shards,bs", [
    (127, 8, 16),  # ADVICE r1: used to give shard0 1 batch, shard7 0
    (100, 4, 5),
    (10, 8, 4),
    (33, 3, 8),
    (7, 2, 7),
    (3, 8, 1),   # padding exceeds the dataset (cyclic repeat needed)
])
def test_sharded_sampler_equal_batch_counts(n, shards, bs, drop_last):
    """Every shard yields exactly the same number of batches (and exactly
    __len__ of them) — multi-host SPMD requires every process to execute
    the same number of collective steps per epoch."""
    counts, lens = [], []
    for s in range(shards):
        smp = ShardedSampler(n, shuffle=True, seed=1, num_shards=shards,
                             shard_index=s, batch_size=bs, drop_last=drop_last)
        smp.set_epoch(2)
        batches = [b for b, _ in smp]
        assert all(len(b) == bs for b in batches), "non-static batch shape"
        counts.append(len(batches))
        lens.append(len(smp))
    assert len(set(counts)) == 1, f"unequal batch counts {counts}"
    assert counts == lens, f"__len__ {lens} != yielded {counts}"


def test_loader_propagates_worker_errors():
    """A dataset exception mid-epoch must surface in the consumer, not
    silently truncate the epoch (review r2)."""
    from automoe_tpu.data.loader import DataLoader

    class Exploding:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            if i >= 8:
                raise OSError("corrupt cache file")
            return {"x": np.zeros(3, np.float32)}

    dl = DataLoader(Exploding(), batch_size=4, num_workers=2, shuffle=False)
    with pytest.raises(RuntimeError, match="DataLoader worker failed"):
        list(dl)


def test_loader_early_break_stops_producer():
    """Breaking out of iteration must not leave the producer thread
    blocked on a full queue (review r2)."""
    import threading

    from automoe_tpu.data.loader import DataLoader

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.full(4, i, np.float32)}

    before = threading.active_count()
    for _ in range(5):
        dl = DataLoader(Slow(), batch_size=4, num_workers=1, shuffle=False,
                        prefetch=1)
        for batch in dl:
            break  # abandon mid-epoch
    import time as _t

    _t.sleep(0.5)
    assert threading.active_count() <= before + 1, (
        f"leaked producer threads: {threading.active_count()} vs {before}"
    )


def test_loader_tail_real_count():
    """The repeat-padded tail batch carries its real sample count."""
    from automoe_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full(2, i, np.float32)}

    dl = DataLoader(DS(), batch_size=4, num_workers=1, shuffle=False,
                    drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    assert "_real_count" not in batches[0]
    assert batches[-1]["_real_count"] == 2
    assert batches[-1]["x"].shape == (4, 2)  # still static
