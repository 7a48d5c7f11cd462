"""Device-resident epoch loader (data/device_resident.py) + the Trainer's
pre-grouped scan path — the machinery behind the sustained-epoch runs
(benchmarks/sustained_epoch_bench.py, VERDICT r3 item 1)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from automoe_tpu.data.device_resident import DeviceEpochLoader
from automoe_tpu.data.loader import DataLoader
from automoe_tpu.train.loop import TrainConfig, Trainer
from automoe_tpu.train.workloads import bdd_expert_workload


def _ids_loader(n=16, B=4, K=2, **kw):
    return DeviceEpochLoader(
        {"x": np.arange(n, dtype=np.float32).reshape(n, 1)},
        batch_size=B, group_size=K, **kw,
    )


def test_epoch_covers_every_sample_once():
    dl = _ids_loader()
    assert len(dl) == 4  # batches per epoch
    seen = []
    for g in dl:
        assert g["x"].shape == (2, 4, 1)
        assert isinstance(g["x"], jax.Array)
        seen.extend(np.asarray(g["x"]).ravel().tolist())
    assert sorted(seen) == list(range(16))


def test_reshuffle_deterministic_and_epoch_dependent():
    def order(dl):
        return [np.asarray(g["x"]).ravel().tolist() for g in dl]

    a, b = _ids_loader(seed=7), _ids_loader(seed=7)
    a.set_epoch(3)
    b.set_epoch(3)
    o3 = order(a)
    assert o3 == order(b)  # deterministic in (seed, epoch)
    a.set_epoch(4)
    assert order(a) != o3  # epochs differ
    assert sorted(sum(order(a), [])) == list(range(16))  # still a perm


def test_pool_cycling_and_shared_constants():
    shared = {"c": np.full((4, 2), 9.0, np.float32)}
    dl = _ids_loader(steps_per_epoch=16, shared=shared)  # 2 natural groups
    groups = list(dl)
    assert len(groups) == 8  # 16 steps / K=2, cycling the 2-group pool
    seen = np.sort(np.concatenate(
        [np.asarray(g["x"]).ravel() for g in groups]))
    # every sample appears steps_per_epoch/natural times (16/4 = 4)
    assert (seen.reshape(16, 4) ==
            np.repeat(np.arange(16), 4).reshape(16, 4)).all()
    for g in groups:
        assert g["c"].shape == (2, 4, 2)  # tiled [K,B,...]
        assert float(np.asarray(g["c"]).mean()) == 9.0


def test_loader_validation_errors():
    with pytest.raises(ValueError, match="divide"):
        _ids_loader(n=15)
    with pytest.raises(ValueError, match="steps_per_epoch"):
        _ids_loader(steps_per_epoch=5)
    dl = _ids_loader()
    with pytest.raises(ValueError, match="align"):
        dl.set_epoch(0, skip_batches=1)
    with pytest.raises(ValueError, match="shared"):
        _ids_loader(shared={"c": np.zeros((3, 2), np.float32)})


def test_mesh_sharded_groups(devices):
    from automoe_tpu.parallel import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=8))
    dl = _ids_loader(n=32, B=8, K=2, mesh=mesh)
    g = next(iter(dl))
    spec = g["x"].sharding.spec
    assert tuple(spec)[:2] == (None, "data")


class _ListLoader:
    """Torch-style host iterable (no set_epoch) over fixed batches."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def _seg_arrays(n, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(size=(n, size, size, 3)).astype(np.float32),
        "mask": rng.integers(0, 3, (n, size, size)).astype(np.int32),
    }


def _cfg(tmp_path, **kw):
    return TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="t",
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
        log_every=1, **kw,
    )


def test_pre_grouped_training_equals_host_path(tmp_path):
    """One epoch of steps_per_call=2 training: device-resident pre-grouped
    groups must produce the SAME final params as the host stack-and-
    transfer path over identical batches in identical order."""
    arr = _seg_arrays(16)
    B, K = 4, 2
    host_batches = [
        {k: v[i * B:(i + 1) * B] for k, v in arr.items()} for i in range(4)
    ]

    wl = bdd_expert_workload("drivable", image_size=32)
    val = _ListLoader(host_batches[:1])

    tr_host = Trainer(
        wl, _ListLoader(host_batches), val,
        _cfg(tmp_path / "h", steps_per_call=K),
    )
    tr_host.fit()

    dev_loader = DeviceEpochLoader(
        arr, batch_size=B, group_size=K, shuffle=False)
    tr_dev = Trainer(
        wl, dev_loader, val, _cfg(tmp_path / "d", steps_per_call=K))
    tr_dev.fit()

    for a, b in zip(jax.tree.leaves(tr_host.state.params),
                    jax.tree.leaves(tr_dev.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_indexed_scan_matches_pre_grouped(tmp_path):
    """index_mode (r5): the indexed scan step — which dynamic-slices its
    own batches out of the flat resident epoch inside ONE jitted program
    — must produce bit-identical final params to the pre-grouped path
    (jitted group gather + scan step) over the same epoch. Shuffle ON so
    the group-order permutation is exercised through both paths."""
    arr = _seg_arrays(16)
    B, K = 4, 2
    wl = bdd_expert_workload("drivable", image_size=32)
    val_b = [{k: v[:B] for k, v in arr.items()}]
    val = _ListLoader(val_b)

    tr_grouped = Trainer(
        wl,
        DeviceEpochLoader(arr, batch_size=B, group_size=K, seed=3),
        val, _cfg(tmp_path / "g", steps_per_call=K),
    )
    tr_grouped.fit()

    tr_indexed = Trainer(
        wl,
        DeviceEpochLoader(arr, batch_size=B, group_size=K, seed=3,
                          index_mode=True),
        val, _cfg(tmp_path / "i", steps_per_call=K),
    )
    tr_indexed.fit()

    for a, b in zip(jax.tree.leaves(tr_grouped.state.params),
                    jax.tree.leaves(tr_indexed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_indexed_mode_rejects_shared():
    with pytest.raises(ValueError, match="index_mode"):
        DeviceEpochLoader(
            {"x": np.zeros((8, 1), np.float32)}, batch_size=2,
            group_size=2, index_mode=True,
            shared={"y": np.zeros((2, 1), np.float32)},
        )


def test_pre_grouped_save_every_steps(tmp_path):
    """save_every_steps bookkeeping counts BATCHES (not groups) under the
    pre-grouped path: with K=2 groups over 8 batches and save_every_steps=4,
    save_step fires at consumed-batch boundaries 4 and 8. (The 'step' dir
    itself is GC'd at epoch completion — ckpt/checkpoint.py:131-138 — so
    spy on the calls, not the filesystem.)"""
    arr = _seg_arrays(32)
    B, K = 4, 2
    wl = bdd_expert_workload("drivable", image_size=32)
    dl = DeviceEpochLoader(arr, batch_size=B, group_size=K, shuffle=False)
    val = DeviceEpochLoader(
        _seg_arrays(4, seed=1), batch_size=4, group_size=1, shuffle=False)
    cfg = _cfg(tmp_path, steps_per_call=K, save_every_steps=4)
    tr = Trainer(wl, dl, val, cfg)
    saved = []
    orig = tr.ckpt.save_step
    tr.ckpt.save_step = lambda state, epoch, batch_index, **kw: (
        saved.append(int(batch_index)), orig(state, epoch, batch_index, **kw)
    )
    tr.train_epoch(0)
    assert saved == [4, 8], saved
    step_dir = tmp_path / "ckpt" / "bdd_drivable" / "t" / "step"
    assert step_dir.exists()  # mid-epoch ckpt present until epoch save


class _MapDS:
    """Map-style dataset with optional read_batch fast path."""

    def __init__(self, n, with_read_batch=False, seed=0):
        rng = np.random.default_rng(seed)
        self.cols = {
            "image": rng.normal(size=(n, 8, 8, 3)).astype(np.float32),
            "speed": rng.uniform(0, 10, (n, 4)).astype(np.float32),
            "waypoints": rng.normal(size=(n, 4, 2)).astype(np.float32),
        }
        self.n = n
        if with_read_batch:
            self.read_batch = self._read_batch

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {k: v[i] for k, v in self.cols.items()}

    def _read_batch(self, idxs):
        ix = np.asarray(idxs)
        return {k: v[ix] for k, v in self.cols.items()}


@pytest.mark.parametrize("fast", [False, True], ids=["rows", "read_batch"])
def test_from_dataset_materializes_trims_and_drops(fast):
    """from_dataset stages every kept field bit-exactly, trims N to a
    batch_size*group_size multiple, drops explicitly-requested `drop`
    keys (default: NOTHING is dropped — r5 fix; frames are live inputs
    of the cached-gating step via the policy backbone), and re-yields
    `shared` constants with every group."""
    ds = _MapDS(n=11, with_read_batch=fast)
    B, K = 2, 2
    shared = {"image": np.zeros((B, 4, 4, 3), np.float32)}
    dl = DeviceEpochLoader.from_dataset(
        ds, batch_size=B, group_size=K, shared=shared, shuffle=False,
        read_chunk=3, verbose=False, drop=("image",),
    )
    assert len(dl) == 4  # 11 samples -> trimmed to 8 -> 4 batches of B=2
    groups = list(dl)
    assert len(groups) == 2
    g0 = groups[0]
    assert set(g0) == {"speed", "waypoints", "image"}
    assert g0["speed"].shape == (K, B, 4)
    assert g0["image"].shape == (K, B, 4, 4, 3)  # the shared dummy, tiled
    # shuffle=False: concatenated groups reproduce the source order exactly
    got = np.concatenate([np.asarray(g["speed"]).reshape(-1, 4)
                          for g in groups])
    np.testing.assert_array_equal(got, ds.cols["speed"][:8])


def test_from_dataset_indices_subset():
    """`indices` stages only the requested rows, in the given order —
    the multi-host path's per-process static shard
    (range(process_index, N, process_count))."""
    ds = _MapDS(n=12, with_read_batch=True)
    idx = list(range(1, 12, 2))  # the "process 1 of 2" slice: 6 rows
    dl = DeviceEpochLoader.from_dataset(
        ds, batch_size=2, group_size=1, shuffle=False, indices=idx,
        drop=(), verbose=False, read_chunk=4,
    )
    assert len(dl) == 3
    got = np.concatenate([np.asarray(b["speed"]) for b in dl])
    np.testing.assert_array_equal(got, ds.cols["speed"][idx])


def test_from_dataset_too_small_raises():
    with pytest.raises(ValueError, match="samples <"):
        DeviceEpochLoader.from_dataset(
            _MapDS(n=3), batch_size=4, group_size=2, verbose=False
        )


def test_rebind_train_loader_rebuilds_schedule(tmp_path):
    """Regression (r4 review): --device-resident swapped train_loader
    AFTER Trainer.__init__ baked the LR-schedule length from the host
    loader, so a trimmed resident loader ran fewer steps than the cosine
    decay spanned. rebind_train_loader must rebuild the optimizer when
    batches-per-epoch changes (and leave it alone when it doesn't)."""
    arr = _seg_arrays(16)
    B = 4
    host_batches = [
        {k: v[i * B:(i + 1) * B] for k, v in arr.items()} for i in range(4)
    ]
    wl = bdd_expert_workload("drivable", image_size=32)
    tr = Trainer(
        wl, _ListLoader(host_batches), _ListLoader(host_batches[:1]),
        _cfg(tmp_path, schedule="cosine"),
    )
    old_tx = tr.state.tx
    # same length (4 batches): no rebuild
    same = DeviceEpochLoader(arr, batch_size=B, shuffle=False)
    tr.rebind_train_loader(same)
    assert tr.train_loader is same
    assert tr.state.tx is old_tx
    # trimmed length (3 batches of 12 samples): schedule rebuilt
    shorter = DeviceEpochLoader(
        {k: v[:12] for k, v in arr.items()}, batch_size=B, shuffle=False)
    tr.rebind_train_loader(shorter)
    assert tr.train_loader is shorter
    assert tr.state.tx is not old_tx
    tr.fit()  # the rebuilt optimizer trains (opt_state structure intact)


def test_cli_device_resident_rejects_grad_accum(tmp_path, monkeypatch):
    """--device-resident + --grad-accum used to crash mid-run with an
    unrelated error AFTER staging the dataset; it must be rejected up
    front."""
    import pytest

    from automoe_tpu.train import cli

    with pytest.raises(SystemExit, match="grad-accum"):
        cli.main([
            "gating", "--data-root", str(tmp_path), "--epochs", "1",
            "--cache-expert-features", "--device-resident",
            "--grad-accum", "2", "--no-mesh",
        ])
