"""Native C++ packed-cache reader (csrc/packed_reader.cpp): correctness
vs the Python memmap path, f16 edge values, and DataLoader integration.

The subsystem this supersedes: the reference's torch worker-process
DataLoader over per-frame .pt files (dataloaders/carla_sequence_loader.py).
"""
import json

import numpy as np
import pytest

pytest.importorskip("ctypes")


@pytest.fixture()
def packed_dir(tmp_path):
    rng = np.random.default_rng(0)
    n = 23
    np.save(tmp_path / "image.npy",
            rng.normal(size=(n, 6, 6, 3)).astype(np.float16))
    np.save(tmp_path / "waypoints.npy",
            rng.normal(size=(n, 8, 2)).astype(np.float32))
    np.save(tmp_path / "speed.npy",
            rng.normal(size=(n, 8)).astype(np.float32))
    (tmp_path / "index.json").write_text(
        json.dumps({"n": n, "horizon": 8,
                    "meta": [{"i": i} for i in range(n)]})
    )
    return tmp_path


def _native(packed_dir, **kw):
    from automoe_tpu.data.native_packed import (
        NativePackedDataset,
        native_available,
    )

    if not native_available():
        pytest.skip("g++ unavailable for the native reader")
    return NativePackedDataset(packed_dir, **kw)


def test_native_matches_python_reader(packed_dir):
    from automoe_tpu.data.packed import PackedSequenceDataset

    py = PackedSequenceDataset(packed_dir)
    nat = _native(packed_dir)
    assert len(py) == len(nat)
    idx = [0, 5, 22, 5, 13]
    b_py = py.read_batch(idx)
    b_nat = nat.read_batch(idx)
    assert set(b_py) == set(b_nat)
    for k in b_py:
        assert b_nat[k].dtype == np.float32
        np.testing.assert_array_equal(b_py[k], b_nat[k])
    # per-sample interface incl. metadata
    s = nat[7]
    assert s["meta"] == {"i": 7}
    np.testing.assert_array_equal(s["image"], py[7]["image"])


def test_native_f16_special_values(tmp_path):
    sp = np.array(
        [6e-8, 5.96e-8, np.inf, -np.inf, np.nan, -0.0, 65504.0, -1.5],
        np.float16,
    )
    img = np.tile(sp, (4, 18)).reshape(4, 12, 12)[:, :12, :12].astype(np.float16)
    np.save(tmp_path / "image.npy", img)
    (tmp_path / "index.json").write_text(json.dumps({"n": 4, "meta": []}))
    nat = _native(tmp_path)
    got = nat.read_batch([0, 3])["image"]
    ref = img[[0, 3]].astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    m = ~np.isnan(ref)
    np.testing.assert_array_equal(got[m], ref[m])


def test_native_rejects_bad_index(packed_dir):
    nat = _native(packed_dir)
    with pytest.raises(ValueError):
        nat.read_batch([0, 99])


def test_loader_uses_read_batch_fast_path(packed_dir):
    from automoe_tpu.data.loader import DataLoader

    nat = _native(packed_dir)
    dl = DataLoader(nat, batch_size=4, shuffle=False, drop_last=True)
    batches = list(dl)
    assert len(batches) == len(nat) // 4
    for b in batches:
        assert b["image"].shape == (4, 6, 6, 3)
        assert b["image"].dtype == np.float32


class _SynthDetection:
    """BDD-detection-shaped dataset: f32 image, f32 boxes, int32 labels."""

    def __init__(self, n=12, size=16, cap=5, seed=3):
        rng = np.random.default_rng(seed)
        self.samples = [
            {
                "image": rng.normal(size=(size, size, 3)).astype(np.float32),
                "bboxes": rng.uniform(0, 1, (cap, 4)).astype(np.float32),
                "labels": rng.integers(-1, 9, (cap,)).astype(np.int32),
            }
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_pack_frames_roundtrip_int32(tmp_path):
    """pack_frames stores int fields as int32 (not floats) and both
    readers return them as int32; f16-packed images round-trip within
    half precision."""
    from automoe_tpu.data.packed import PackedFrameDataset, pack_frames

    ds = _SynthDetection()
    # image rows are tiny here — force the f16 threshold down so the test
    # exercises the f16 image path like a real 256x256x3 cache would
    import automoe_tpu.data.packed as P

    old = P._F16_MIN_ROW_ELEMS
    P._F16_MIN_ROW_ELEMS = 500  # image rows (16*16*3=768) only, not boxes
    try:
        n = pack_frames(ds, tmp_path / "packed")
    finally:
        P._F16_MIN_ROW_ELEMS = old
    assert n == len(ds)

    py = PackedFrameDataset(tmp_path / "packed")
    nat = _native(tmp_path / "packed")
    assert len(py) == len(nat) == n
    idx = [0, 5, 11, 3]
    pb, nb = py.read_batch(idx), nat.read_batch(idx)
    for reader_name, batch in (("python", pb), ("native", nb)):
        assert batch["labels"].dtype == np.int32, reader_name
        assert batch["image"].dtype == np.float32, reader_name
        for j, i in enumerate(idx):
            np.testing.assert_array_equal(
                batch["labels"][j], ds[i]["labels"], err_msg=reader_name
            )
            np.testing.assert_array_equal(
                batch["bboxes"][j], ds[i]["bboxes"], err_msg=reader_name
            )
            np.testing.assert_allclose(
                batch["image"][j], ds[i]["image"], rtol=2e-3, atol=2e-3,
                err_msg=reader_name,
            )
    # per-sample interface too
    s = nat[7]
    assert s["labels"].dtype == np.int32
    np.testing.assert_array_equal(s["labels"], ds[7]["labels"])


def test_packed_root_factory_and_loader(tmp_path):
    """get_bdd_detection_loader(packed_root=...) serves batches from the
    packed cache through the DataLoader's read_batch fast path with the
    dtypes training expects."""
    from automoe_tpu.data.factories import get_bdd_detection_loader
    from automoe_tpu.data.packed import pack_frames

    ds = _SynthDetection(n=8)
    for split in ("train", "val"):
        pack_frames(ds, tmp_path / split)
    loader = get_bdd_detection_loader(
        split="train", batch_size=4, num_workers=1,
        packed_root=str(tmp_path), box_cap=5,
    )
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["image"].dtype == np.float32
    assert batch["labels"].dtype == np.int32
    assert batch["bboxes"].shape == (4, 5, 4)


def test_packed_root_cap_mismatch_raises(tmp_path):
    """A packed cache built with one box_cap refuses to serve a loader
    that requests another (instead of an opaque shape error under jit)."""
    from automoe_tpu.data.factories import get_bdd_detection_loader
    from automoe_tpu.data.packed import pack_frames

    pack_frames(_SynthDetection(n=6, cap=5), tmp_path / "train")
    with pytest.raises(ValueError, match="leading dim 5"):
        get_bdd_detection_loader(
            split="train", batch_size=2, num_workers=1,
            packed_root=str(tmp_path), box_cap=48,
        )
