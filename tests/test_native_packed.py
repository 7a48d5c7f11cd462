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
