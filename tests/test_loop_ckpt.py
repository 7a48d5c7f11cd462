"""End-to-end trainer loop + checkpoint/resume tests (synthetic data)."""
from __future__ import annotations

import json

import jax
import numpy as np
import pytest

from automoe_tpu.data.loader import DataLoader
from automoe_tpu.train.loop import TrainConfig, Trainer
from automoe_tpu.train.workloads import bdd_expert_workload


class SyntheticSegDataset:
    def __init__(self, n=12, size=32, classes=3, seed=0):
        rng = np.random.default_rng(seed)
        self.samples = [
            {
                "image": rng.normal(size=(size, size, 3)).astype(np.float32),
                "mask": rng.integers(0, classes, (size, size)).astype(np.int32),
            }
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def _make_trainer(tmp_path, epochs=2, resume=None, resume_from="last"):
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(SyntheticSegDataset(8), batch_size=4, num_workers=1, shuffle=True)
    val = DataLoader(
        SyntheticSegDataset(4, seed=1), batch_size=4, num_workers=1,
        shuffle=False, drop_last=False,
    )
    cfg = TrainConfig(
        epochs=epochs,
        learning_rate=1e-3,
        run_name="t",
        ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"),
        save_freq=1,
        resume=resume,
        resume_from=resume_from,
        log_every=1,
    )
    return Trainer(wl, train, val, cfg)


def test_trainer_fit_and_artifacts(tmp_path):
    tr = _make_trainer(tmp_path, epochs=2)
    out = tr.fit(config_dump={"note": "test"})
    assert np.isfinite(out["best_val_loss"])
    ckpt_dir = tmp_path / "ckpt" / "bdd_drivable" / "t"
    assert (ckpt_dir / "best").exists()
    assert (ckpt_dir / "last").exists()
    assert (ckpt_dir / "epoch_1").exists()
    assert (ckpt_dir / "config.json").exists()
    jsonl = tmp_path / "runs" / "bdd_drivable_t" / "metrics.jsonl"
    lines = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert any("train/loss" in l for l in lines)
    assert any("val/loss" in l for l in lines)
    # per-epoch task metrics (reference train_bdd100k_ddp.py:368-375)
    val_lines = [l for l in lines if "val/pixel_acc" in l]
    assert val_lines, "validation task metrics missing from metrics.jsonl"
    assert all(0.0 <= l["val/pixel_acc"] <= 1.0 for l in val_lines)
    assert all(0.0 <= l["val/mean_iou"] <= 1.0 for l in val_lines)

    # resume 'full' restores step + optimizer position
    tr2 = _make_trainer(tmp_path, epochs=3, resume="full", resume_from="last")
    assert int(tr2.state.step) == 4  # 2 epochs x 2 steps
    assert tr2.start_epoch == 2

    # resume 'model' restores weights only
    tr3 = _make_trainer(tmp_path, epochs=1, resume="model", resume_from="best")
    assert int(tr3.state.step) == 0
    p_restored = jax.tree.leaves(tr3.state.params)[0]
    p_saved = jax.tree.leaves(tr2.state.params)[0]
    assert p_restored.shape == p_saved.shape


def test_detection_val_task_metrics(tmp_path, rng):
    """Detection validation logs avg_iou + recall@0.5 per epoch."""
    from automoe_tpu.train.workloads import bdd_expert_workload as _wl

    class Det:
        def __init__(self, n=8):
            self.samples = [
                {
                    "image": rng.normal(size=(64, 64, 3)).astype(np.float32),
                    "bboxes": np.concatenate(
                        [rng.uniform(0.1, 0.4, (3, 2)), rng.uniform(0.5, 0.9, (3, 2))],
                        axis=1,
                    ).astype(np.float32),
                    "labels": rng.integers(0, 10, (3,)).astype(np.int32),
                }
                for _ in range(n)
            ]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    wl = _wl("detection", image_size=64, box_cap=3)
    train = DataLoader(Det(), batch_size=4, num_workers=1, shuffle=True)
    val = DataLoader(Det(), batch_size=4, num_workers=1, shuffle=False)
    cfg = TrainConfig(
        epochs=1, run_name="d", ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"), log_every=1,
    )
    Trainer(wl, train, val, cfg).fit()
    jsonl = tmp_path / "runs" / "bdd_detection_d" / "metrics.jsonl"
    lines = [json.loads(l) for l in jsonl.read_text().splitlines()]
    val_lines = [l for l in lines if "val/avg_iou" in l]
    assert val_lines and all("val/recall_0.5" in l for l in val_lines)


def test_load_expert_checkpoints_orbax(tmp_path):
    """An orbax expert checkpoint written by the trainer loads into the
    AutoMoE composite (the gating CLI --expert-ckpts path; the restore is
    partial — ckpt also stores step/opt_state)."""
    from automoe_tpu.ckpt.compose import load_expert_checkpoints
    from automoe_tpu.configs import load_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.utils import jit_init

    tr = _make_trainer(tmp_path, epochs=1)
    tr.fit()
    ckpt = tmp_path / "ckpt" / "bdd_drivable" / "t" / "best"

    cfg = load_model_config({
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    })
    model = create_automoe_model(cfg)
    batch = {
        "image": np.zeros((1, 32, 32, 3), np.float32),
        "speed": np.zeros((1, 1), np.float32),
        "steering": np.zeros((1, 1), np.float32),
        "throttle": np.zeros((1, 1), np.float32),
        "brake": np.zeros((1, 1), np.float32),
    }
    import jax.numpy as jnp

    variables = jit_init(
        model, jax.random.key(0), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    loaded = load_expert_checkpoints(variables, cfg, [str(ckpt), ""])
    trained_leaf = jax.tree.leaves(tr.state.params)[0]
    loaded_leaf = jax.tree.leaves(loaded["params"]["expert_0"])[0]
    np.testing.assert_allclose(np.asarray(loaded_leaf), np.asarray(trained_leaf))
    # untouched expert stays at init
    for a, b in zip(
        jax.tree.leaves(loaded["params"]["expert_1"]),
        jax.tree.leaves(variables["params"]["expert_1"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_variables_missing_key_guard(tmp_path, capfd):
    """partial_restore silently keeps template (init) values for template
    keys the checkpoint lacks — the r5 nuScenes-2D remap bug shipped that
    way. load_variables now checks checkpoint METADATA: default warns on
    stderr, on_missing='raise' errors, matched layouts stay silent."""
    from automoe_tpu.ckpt.checkpoint import load_variables

    tr = _make_trainer(tmp_path, epochs=1)
    tr.fit()
    ckpt = str(tmp_path / "ckpt" / "bdd_drivable" / "t" / "best")

    good_t = {
        "params": tr.state.params,
        "batch_stats": tr.state.batch_stats,
    }
    capfd.readouterr()
    out = load_variables(ckpt, good_t)
    assert "WARNING" not in capfd.readouterr().err
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out["params"])[0]),
        np.asarray(jax.tree.leaves(tr.state.params)[0]),
    )

    bad_t = {
        "params": dict(tr.state.params,
                       phantom_head={"kernel": np.zeros((2, 2), np.float32)}),
        "batch_stats": tr.state.batch_stats,
    }
    out = load_variables(ckpt, bad_t)  # default: warn, keep going
    err = capfd.readouterr().err
    assert "phantom_head" in err and "WARNING" in err
    # the phantom leaf stayed at its template value
    np.testing.assert_array_equal(
        np.asarray(out["params"]["phantom_head"]["kernel"]), 0.0
    )

    with pytest.raises(KeyError, match="phantom_head"):
        load_variables(ckpt, bad_t, on_missing="raise")

    out = load_variables(ckpt, bad_t, on_missing="ignore")  # silent
    assert "WARNING" not in capfd.readouterr().err


def test_allreduce_val_sums_multiprocess(monkeypatch):
    """Simulated 2-process aggregation: sums and counts add exactly, so
    every process derives the same val averages (reference
    train_gating_network.py:153-156)."""
    from automoe_tpu.train import loop as L

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    class FakeMHU:
        @staticmethod
        def process_allgather(local):
            # keys are sorted: [avg_iou_sum, loss_sum, n]
            other = np.asarray([2.0, 10.0, 4.0])
            return np.stack([np.asarray(local), other])

    monkeypatch.setattr(
        "jax.experimental.multihost_utils", FakeMHU
    )
    sums, n = L._allreduce_val_sums({"loss": 6.0, "avg_iou": 1.0}, 4)
    assert n == 8
    assert sums == {"avg_iou": 3.0, "loss": 16.0}


def test_trainer_scan_steps_per_call(tmp_path):
    """steps_per_call=2 over 3 batches/epoch: one scanned dispatch (K=2)
    plus a single-step tail; state.step advances per optimizer step and
    the loop's loss averaging sees every step."""
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(
        SyntheticSegDataset(12), batch_size=4, num_workers=1, shuffle=True
    )
    val = DataLoader(
        SyntheticSegDataset(4, seed=1), batch_size=4, num_workers=1,
        shuffle=False, drop_last=False,
    )
    cfg = TrainConfig(
        epochs=2,
        learning_rate=1e-3,
        run_name="scan",
        ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"),
        log_every=1,
        steps_per_call=2,
    )
    tr = Trainer(wl, train, val, cfg)
    out = tr.fit()
    assert np.isfinite(out["best_val_loss"])
    # 3 batches/epoch x 2 epochs = 6 optimizer steps regardless of grouping
    assert int(tr.state.step) == 6
    # metrics were logged from inside the scanned groups too
    metrics_file = (
        tmp_path / "runs" / "bdd_drivable_scan" / "metrics.jsonl"
    )
    lines = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    assert any(
        k.startswith("train/") for r in lines for k in r
    ), lines[:3]


def test_validate_exact_tail_bit_equality(tmp_path):
    """VERDICT r2 #6: on a non-divisible val set the padded tail batch is
    TRIMMED to its real rows before eval — validate() must equal the
    unpadded computation bit-for-bit (the reference evaluates the true
    remainder batch, train_bdd100k_ddp.py:336-375)."""
    wl = bdd_expert_workload("drivable", image_size=32)
    ds = SyntheticSegDataset(6, seed=3)  # 6 samples, batch 4 → tail of 2
    train = DataLoader(SyntheticSegDataset(4), batch_size=4, num_workers=1)
    val = DataLoader(
        ds, batch_size=4, num_workers=1, shuffle=False, drop_last=False
    )
    cfg = TrainConfig(
        epochs=1, run_name="tail", ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"),
    )
    tr = Trainer(wl, train, val, cfg)
    got = tr.validate(0)

    # manual unpadded computation with the same eval_step
    def batch_of(samples):
        return {
            "image": np.stack([s["image"] for s in samples]),
            "mask": np.stack([s["mask"] for s in samples]),
        }

    m_full = tr.eval_step(tr.state, batch_of(ds.samples[:4]), tr.rng)
    m_tail = tr.eval_step(tr.state, batch_of(ds.samples[4:6]), tr.rng)
    want = (float(m_full["loss"]) * 1.0 + float(m_tail["loss"]) * 0.5) / 1.5
    assert got == want, (got, want)


def test_scan_tail_bookkeeping(tmp_path):
    """r3 advisor fix: when the loader is shorter than steps_per_call,
    every batch runs through the scan path's tail loop — which must still
    write --save-every-steps checkpoints and heartbeat."""
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(
        SyntheticSegDataset(12), batch_size=4, num_workers=1, shuffle=True
    )
    cfg = TrainConfig(
        epochs=1, run_name="stail", ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"),
        steps_per_call=8,  # > 3 batches → all batches hit the tail loop
        save_every_steps=2,
    )
    tr = Trainer(wl, train, train, cfg)
    tr.train_epoch(0)
    assert int(tr.state.step) == 3
    assert (tmp_path / "ckpt" / "bdd_drivable" / "stail" / "step").exists()


def test_scan_group_with_mixed_key_sets(tmp_path):
    """r3 advisor fix: stack_batch drops optional keys per-batch by
    intersection, so batches inside one scan group can carry different
    key sets — the group stack must intersect keys, not KeyError."""

    class MixedAux(SyntheticSegDataset):
        def __getitem__(self, i):
            s = dict(super().__getitem__(i))
            if i < 4:  # first batch (shuffle off) carries an extra key
                s["aux"] = np.float32(i)
            return s

    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(
        MixedAux(8), batch_size=4, num_workers=1, shuffle=False
    )
    cfg = TrainConfig(
        epochs=1, run_name="mix", ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"), steps_per_call=2,
    )
    tr = Trainer(wl, train, train, cfg)
    tr.train_epoch(0)  # group = [batch-with-aux, batch-without] — no crash
    assert int(tr.state.step) == 2


def test_trainer_profile_trace(tmp_path):
    """profile_dir captures a jax.profiler trace of the first epoch."""
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(
        SyntheticSegDataset(4), batch_size=4, num_workers=1, shuffle=True
    )
    cfg = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="prof",
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
        profile_dir=str(tmp_path / "trace"),
    )
    Trainer(wl, train, train, cfg).fit()
    produced = list((tmp_path / "trace").rglob("*"))
    assert any(p.is_file() for p in produced), produced


class _TruncatedLoader:
    """Wraps a DataLoader, yielding only the first n batches — simulates a
    run killed mid-epoch (the 'step' checkpoint survives)."""

    def __init__(self, dl, n):
        self.dl, self.n = dl, n

    def __len__(self):
        # full length: a crashed run had computed its LR schedule from the
        # whole loader, only the iteration stopped early
        return len(self.dl)

    def set_epoch(self, e):
        self.dl.set_epoch(e)

    def __iter__(self):
        for i, b in enumerate(self.dl):
            if i >= self.n:
                break
            yield b


def test_mid_epoch_step_resume(tmp_path):
    """save_every_steps writes a mid-epoch 'step' checkpoint; resuming
    from it skips the consumed batches and lands on the same final state
    as an uninterrupted run (deterministic per-epoch shuffle + RNG folded
    on state.step)."""

    def loaders():
        train = DataLoader(
            SyntheticSegDataset(16), batch_size=4, num_workers=1, shuffle=True
        )
        val = DataLoader(
            SyntheticSegDataset(4, seed=1), batch_size=4, num_workers=1,
            shuffle=False, drop_last=False,
        )
        return train, val

    def cfg(root, resume=None, resume_from="last"):
        return TrainConfig(
            epochs=1, learning_rate=1e-3, run_name="sr",
            ckpt_root=str(root / "ckpt"), runs_root=str(root / "runs"),
            save_every_steps=2, resume=resume, resume_from=resume_from,
        )

    wl = bdd_expert_workload("drivable", image_size=32)

    # interrupted run: only 2 of 4 batches before the "crash"
    train, val = loaders()
    # train_epoch only — a real crash never reaches the epoch-end
    # save_epoch (which supersedes the 'step' checkpoint)
    Trainer(wl, _TruncatedLoader(train, 2), val, cfg(tmp_path)).train_epoch(0)
    assert (tmp_path / "ckpt" / "bdd_drivable" / "sr" / "step").exists()

    # resume from the step checkpoint with the FULL loader
    train, val = loaders()
    tr_b = Trainer(
        wl, train, val, cfg(tmp_path, resume="full", resume_from="step")
    )
    assert tr_b.start_epoch == 0 and tr_b.start_batch == 2
    assert int(tr_b.state.step) == 2
    tr_b.fit()
    assert int(tr_b.state.step) == 4

    # control: uninterrupted run in a fresh dir
    ctl = tmp_path / "ctl"
    train, val = loaders()
    tr_c = Trainer(wl, train, val, cfg(ctl))
    tr_c.fit()
    assert int(tr_c.state.step) == 4

    for a, b in zip(
        jax.tree.leaves(tr_b.state.params), jax.tree.leaves(tr_c.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        )


def test_step_resume_fallback_after_clean_epoch(tmp_path):
    """A completed epoch supersedes the 'step' checkpoint; a supervisor
    relaunch with --resume-from step then falls back to 'last' and starts
    the NEXT epoch at batch 0 (no retraining, no best_val rollback)."""
    wl = bdd_expert_workload("drivable", image_size=32)

    def loaders():
        train = DataLoader(
            SyntheticSegDataset(8), batch_size=4, num_workers=1, shuffle=True
        )
        val = DataLoader(
            SyntheticSegDataset(4, seed=1), batch_size=4, num_workers=1,
            shuffle=False, drop_last=False,
        )
        return train, val

    def cfg(resume=None, resume_from="last"):
        return TrainConfig(
            epochs=1, learning_rate=1e-3, run_name="fb",
            ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
            save_every_steps=1, resume=resume, resume_from=resume_from,
        )

    train, val = loaders()
    Trainer(wl, train, val, cfg()).fit()
    ckpt_dir = tmp_path / "ckpt" / "bdd_drivable" / "fb"
    assert not (ckpt_dir / "step").exists()  # superseded at epoch end
    assert (ckpt_dir / "last").exists()

    train, val = loaders()
    tr = Trainer(wl, train, val, cfg(resume="full", resume_from="step"))
    assert tr.start_epoch == 1 and tr.start_batch == 0
    assert int(tr.state.step) == 2


def test_resume_skip_is_index_level(tmp_path):
    """Resuming mid-epoch must not load the already-consumed samples:
    the skip happens in the sampler index stream, before __getitem__."""

    class Counting(SyntheticSegDataset):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.reads = 0

        def __getitem__(self, i):
            self.reads += 1
            return super().__getitem__(i)

    wl = bdd_expert_workload("drivable", image_size=32)
    cfg = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="sk",
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
        save_every_steps=2,
    )
    ds = Counting(16)
    train = DataLoader(ds, batch_size=4, num_workers=1, shuffle=True)
    val = DataLoader(
        SyntheticSegDataset(4, seed=1), batch_size=4, num_workers=1,
        shuffle=False, drop_last=False,
    )
    Trainer(wl, _TruncatedLoader(train, 2), val, cfg).train_epoch(0)

    ds2 = Counting(16)
    train2 = DataLoader(ds2, batch_size=4, num_workers=1, shuffle=True)
    cfg2 = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="sk",
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
        save_every_steps=2, resume="full", resume_from="step",
    )
    tr = Trainer(wl, train2, val, cfg2)
    assert tr.start_batch == 2
    tr.train_epoch(0)
    # only the 2 remaining batches (8 samples) were materialized
    assert ds2.reads == 8, ds2.reads
    assert int(tr.state.step) == 4


def test_resumed_flag_tracks_actual_restore(tmp_path):
    """Review r2: trainer.resumed is True only when a checkpoint actually
    loaded — the gating CLI uses it to graft expert checkpoints on a
    supervisor relaunch that found nothing to restore."""
    wl = bdd_expert_workload("drivable", image_size=32)

    def mk(resume=None, resume_from="last"):
        train = DataLoader(
            SyntheticSegDataset(8), batch_size=4, num_workers=1, shuffle=True
        )
        cfg = TrainConfig(
            epochs=1, run_name="rf", ckpt_root=str(tmp_path / "ckpt"),
            runs_root=str(tmp_path / "runs"),
            resume=resume, resume_from=resume_from,
        )
        return Trainer(wl, train, train, cfg)

    # nothing on disk: resume-from-step relaunch restores nothing
    tr = mk(resume="full", resume_from="step")
    assert tr.resumed is False and tr.start_epoch == 0

    tr.fit()
    tr2 = mk(resume="full", resume_from="step")
    assert tr2.resumed is True and tr2.start_epoch == 1


def test_async_ckpt_equivalence(tmp_path):
    """--async-ckpt: the payload snapshot is synchronous (no torn state),
    writes overlap training, fit() waits for the tail write — so an async
    run's checkpoints must be byte-identical in content to a sync run's
    on the same seed/data, and a restart must resume from them."""
    wl = bdd_expert_workload("drivable", image_size=32)

    def run(sub, async_ckpt):
        train = DataLoader(SyntheticSegDataset(8), batch_size=4,
                           num_workers=0, shuffle=False)
        val = DataLoader(SyntheticSegDataset(4, seed=1), batch_size=4,
                         num_workers=0, shuffle=False)
        cfg = TrainConfig(
            epochs=2, learning_rate=1e-3, run_name="a", log_every=1,
            save_freq=1, save_every_steps=1, async_ckpt=async_ckpt,
            ckpt_root=str(tmp_path / sub / "ckpt"),
            runs_root=str(tmp_path / sub / "runs"),
        )
        tr = Trainer(wl, train, val, cfg)
        out = tr.fit()
        return tr, out

    tr_s, out_s = run("sync", False)
    tr_a, out_a = run("async", True)
    assert out_s["best_val_loss"] == out_a["best_val_loss"]
    # restore both 'best' checkpoints into fresh states: identical trees
    from automoe_tpu.ckpt.checkpoint import load_variables

    tmpl = {"params": tr_s.state.params,
            "batch_stats": tr_s.state.batch_stats}
    vs = load_variables(str(tmp_path / "sync/ckpt/bdd_drivable/a/best"), tmpl)
    va = load_variables(str(tmp_path / "async/ckpt/bdd_drivable/a/best"), tmpl)
    for ls, la in zip(jax.tree.leaves(vs), jax.tree.leaves(va)):
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(la))
    # and the async run's checkpoints support a full resume
    train = DataLoader(SyntheticSegDataset(8), batch_size=4, num_workers=0,
                       shuffle=False)
    cfg = TrainConfig(
        epochs=3, learning_rate=1e-3, run_name="a", log_every=1,
        resume="full", resume_from="last", async_ckpt=True,
        ckpt_root=str(tmp_path / "async" / "ckpt"),
        runs_root=str(tmp_path / "async" / "runs"),
    )
    tr2 = Trainer(wl, train, train, cfg)
    assert tr2.start_epoch == 2
    out2 = tr2.fit()
    assert np.isfinite(out2["best_val_loss"])


def test_keep_epochs_gc(tmp_path):
    """--keep-epochs K retains only the newest K periodic checkpoints;
    best/last survive."""
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(SyntheticSegDataset(8), batch_size=4, num_workers=0,
                       shuffle=False)
    cfg = TrainConfig(
        epochs=5, learning_rate=1e-3, run_name="gc", log_every=1,
        save_freq=1, keep_epochs=2,
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
    )
    Trainer(wl, train, train, cfg).fit()
    d = tmp_path / "ckpt" / "bdd_drivable" / "gc"
    kept = sorted(p.name for p in d.glob("epoch_*"))
    assert kept == ["epoch_4", "epoch_5"]
    assert (d / "best").exists() and (d / "last").exists()


def test_nuscenes_2d_checkpoint_into_gating_expert(tmp_path, rng):
    """The CARLA fine-tune's NuScenesImage2DHead checkpoint grafts into
    the composite's NuScenesExpert slot via the module-name remap
    (mlp_fc*->decoder_fc*, box_head->bbox_head — the orbax mirror of the
    reference's load-time remap, automoe.py:250-262). This is the 4th
    expert handoff of train_gating_network.sh:27-33."""
    from automoe_tpu.ckpt.compose import load_expert_checkpoints
    from automoe_tpu.configs import load_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.train.workloads import carla_nuscenes_2d_workload
    from automoe_tpu.utils import jit_init

    class Det:
        def __init__(self, n=8):
            self.samples = [
                {
                    "image": rng.normal(size=(32, 32, 3)).astype(np.float32),
                    "bboxes": np.array([[2, 2, 20, 20]], np.float32),
                    "labels": np.array([1], np.int32),
                }
                for _ in range(n)
            ]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    wl = carla_nuscenes_2d_workload(num_queries=8, image_size=32, box_cap=4)
    train = DataLoader(Det(), batch_size=4, num_workers=1, shuffle=True)
    val = DataLoader(Det(4), batch_size=4, num_workers=1, shuffle=False)
    cfg = TrainConfig(
        epochs=1, run_name="n2d", ckpt_root=str(tmp_path / "ckpt"),
        runs_root=str(tmp_path / "runs"), log_every=1,
    )
    tr = Trainer(wl, train, val, cfg)
    tr.fit()
    ckpt = tmp_path / "ckpt" / "carla_nuscenes_2d" / "n2d" / "best"
    assert ckpt.exists()

    mcfg = load_model_config({
        "experts": [
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    })
    model = create_automoe_model(mcfg)
    import jax.numpy as jnp

    batch = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "speed": jnp.zeros((1, 1), jnp.float32),
        "steering": jnp.zeros((1, 1), jnp.float32),
        "throttle": jnp.zeros((1, 1), jnp.float32),
        "brake": jnp.zeros((1, 1), jnp.float32),
    }
    variables = jit_init(model, jax.random.key(0), batch)
    loaded = load_expert_checkpoints(variables, mcfg, [str(ckpt)])
    exp = loaded["params"]["expert_0"]
    trained = tr.state.params
    # every remapped module carries the TRAINED weights
    np.testing.assert_allclose(
        np.asarray(exp["decoder_fc1"]["kernel"]),
        np.asarray(trained["mlp_fc1"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(exp["bbox_head"]["kernel"]),
        np.asarray(trained["box_head"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(exp["class_head"]["kernel"]),
        np.asarray(trained["class_head"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(exp["query_embed"]),
        np.asarray(trained["query_embed"]),
    )
    # trained BN stats ride along
    np.testing.assert_allclose(
        np.asarray(
            jax.tree.leaves(loaded["batch_stats"]["expert_0"])[0]
        ),
        np.asarray(jax.tree.leaves(tr.state.batch_stats)[0]),
    )


def test_init_from_warm_start(tmp_path):
    """--init-from grafts another run's params+batch_stats into a fresh
    trainer (the experts->finetune checkpoint chain, tools/campaign.py);
    a resumed trainer is NOT re-grafted."""
    from types import SimpleNamespace

    from automoe_tpu.train.cli import _graft_init_from

    tr = _make_trainer(tmp_path, epochs=1)
    tr.fit()
    ckpt = str(tmp_path / "ckpt" / "bdd_drivable" / "t" / "best")

    fresh = _make_trainer(tmp_path / "second", epochs=1)
    before = np.asarray(jax.tree.leaves(fresh.state.params)[0]).copy()
    _graft_init_from(fresh, SimpleNamespace(init_from=ckpt))
    after = jax.tree.leaves(fresh.state.params)[0]
    trained = jax.tree.leaves(tr.state.params)[0]
    np.testing.assert_allclose(np.asarray(after), np.asarray(trained))
    assert not np.allclose(before, np.asarray(after))

    # resumed trainer keeps its restored weights (no re-graft)
    resumed = _make_trainer(tmp_path, epochs=2, resume="full")
    assert resumed.resumed
    w0 = np.asarray(jax.tree.leaves(resumed.state.params)[0]).copy()
    _graft_init_from(resumed, SimpleNamespace(init_from=ckpt))
    np.testing.assert_array_equal(
        w0, np.asarray(jax.tree.leaves(resumed.state.params)[0])
    )
