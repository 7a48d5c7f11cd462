"""Gradient accumulation (make_grad_accum_train_step / --grad-accum).

K loader microbatches → ONE optimizer step from the averaged gradients:
the effective batch is K×mb with one microbatch of activations live.
Pins: (a) K=1 reduces to the plain train step, (b) K=2 equals a manual
two-grad average with BN stats threaded microbatch-to-microbatch (the
documented torch-matching semantics), (c) the Trainer path the CLI's
--grad-accum reaches runs and steps the optimizer once per group,
(d) CLI routing + exclusivity with steps_per_call.
No reference counterpart (the DDP trainers scale batch only by adding
GPUs — /root/reference/training/train_bdd100k_ddp.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.parallel import MeshSpec, make_mesh, shard_batch
from automoe_tpu.parallel.mesh import shard_stacked_batch
from automoe_tpu.train import TrainState, make_optimizer, make_train_step
from automoe_tpu.train.step import make_grad_accum_train_step
from automoe_tpu.train.workloads import bdd_expert_workload


def _state(variables, steps=3):
    tx = make_optimizer(
        learning_rate=1e-3, weight_decay=0.0, total_steps=steps,
        optimizer="sgd",
    )
    return TrainState.create(
        params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def _batch(rng, n=8):
    return {
        "image": rng.normal(size=(n, 32, 32, 3)).astype(np.float32),
        "mask": rng.integers(0, 3, (n, 32, 32)).astype(np.int32),
    }


def _assert_trees_close(tree_a, tree_b, rtol=1e-5, atol=1e-7):
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(tree_a),
        jax.tree_util.tree_leaves_with_path(tree_b),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_accum_k1_matches_plain():
    """A [1, B, ...] group must reduce to exactly one plain step
    (drivable has no dropout, so the per-microbatch RNG fold is inert)."""
    wl = bdd_expert_workload("drivable", image_size=32)
    variables = jax.device_get(wl.init_variables(jax.random.key(0)))
    batch = _batch(np.random.default_rng(0))
    mesh = make_mesh(MeshSpec(data=8, model=1))

    plain = make_train_step(wl.loss_fn, mesh=mesh)
    st_a, m_a = plain(
        _state(variables), shard_batch(batch, mesh), jax.random.key(1)
    )

    accum = make_grad_accum_train_step(wl.loss_fn, mesh=mesh)
    stacked = shard_stacked_batch(
        {k: v[None] for k, v in batch.items()}, mesh
    )
    st_b, m_b = accum(_state(variables), stacked, jax.random.key(1))

    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6
    )
    _assert_trees_close(
        jax.device_get((st_a.params, st_a.batch_stats)),
        jax.device_get((st_b.params, st_b.batch_stats)),
    )


def test_accum_matches_manual_average():
    """K=2 semantics, pinned leaf-by-leaf: gradients of each microbatch
    at the SAME params, BN stats threaded 1→2, averaged, applied once.
    Single-device on purpose — an un-jitted grad over mesh-sharded
    inputs dispatches eager per-primitive collectives (and this CPU
    runtime's 40 s rendezvous can abort); the sharded path is covered by
    test_accum_k1_matches_plain and the Trainer test."""
    wl = bdd_expert_workload("drivable", image_size=32)
    variables = jax.device_get(wl.init_variables(jax.random.key(0)))
    rng = np.random.default_rng(1)
    mb1, mb2 = _batch(rng), _batch(rng)

    # manual composition (host-orchestrated)
    st = _state(variables)
    key = jax.random.fold_in(jax.random.key(1), st.step)

    @jax.jit
    def grad_of(params, stats, batch, k):
        def wrapped(p):
            return wl.loss_fn(p, stats, batch, k, True)

        (loss, (_, new_stats)), grads = jax.value_and_grad(
            wrapped, has_aux=True
        )(params)
        return loss, grads, new_stats

    l1, g1, stats1 = grad_of(
        st.params, st.batch_stats, mb1, jax.random.fold_in(key, 0)
    )
    l2, g2, stats2 = grad_of(
        st.params, stats1, mb2, jax.random.fold_in(key, 1)
    )
    g = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    st_manual = st.apply_gradients(g, new_batch_stats=stats2)

    # the jitted group step
    accum = make_grad_accum_train_step(wl.loss_fn)
    stacked = {k: np.stack([mb1[k], mb2[k]]) for k in mb1}
    st_accum, metrics = accum(_state(variables), stacked, jax.random.key(1))

    np.testing.assert_allclose(
        (float(l1) + float(l2)) / 2.0, float(metrics["loss"]), rtol=1e-6
    )
    _assert_trees_close(
        jax.device_get((st_manual.params, st_manual.batch_stats)),
        jax.device_get((st_accum.params, st_accum.batch_stats)),
    )


def test_trainer_grad_accum_runs(tmp_path):
    """Trainer with grad_accum=2 over 4 loader batches: 2 optimizer
    steps per epoch, finite val loss."""
    from automoe_tpu.data.loader import DataLoader
    from automoe_tpu.train.loop import TrainConfig, Trainer

    class _Seg:
        def __len__(self):
            return 32  # 4 loader batches of 8 (divisible by the 8-dev mesh)

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {
                "image": r.normal(size=(32, 32, 3)).astype(np.float32),
                "mask": r.integers(0, 3, (32, 32)).astype(np.int32),
            }

    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(_Seg(), batch_size=8, num_workers=0, shuffle=False)
    cfg = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="ga", grad_accum=2,
        ckpt_root=str(tmp_path / "c"), runs_root=str(tmp_path / "r"),
        save_freq=1, log_every=1,
    )
    tr = Trainer(wl, train, train, cfg, mesh=make_mesh(MeshSpec(data=8, model=1)))
    out = tr.fit()
    assert np.isfinite(out["best_val_loss"])
    assert int(jax.device_get(tr.state.step)) == 2  # 4 batches / K=2


def test_trainer_grad_accum_exclusive_with_scan(tmp_path):
    from automoe_tpu.train.loop import TrainConfig, Trainer

    wl = bdd_expert_workload("drivable", image_size=32)
    cfg = TrainConfig(grad_accum=2, steps_per_call=2)
    with pytest.raises(ValueError, match="exclusive"):
        Trainer(wl, [], [], cfg, mesh=make_mesh(MeshSpec(data=8, model=1)))


def test_cli_grad_accum_flag(monkeypatch):
    """`automoe-train bdd --grad-accum 4` must reach TrainConfig."""
    from automoe_tpu.train import cli as tcli

    seen = {}

    class FakeTrainer:
        def __init__(self, wl, train, val, cfg, mesh=None):
            seen["cfg"] = cfg
            raise SystemExit(0)

    monkeypatch.setattr(tcli, "Trainer", FakeTrainer)
    monkeypatch.setattr(tcli, "_init_backend", lambda args: None)
    monkeypatch.setattr(tcli, "_loaders", lambda *a, **kw: ([], []))
    with pytest.raises(SystemExit):
        tcli.main(
            ["bdd", "--task", "drivable", "--grad-accum", "4", "--no-mesh"]
        )
    assert seen["cfg"].grad_accum == 4


def test_grad_accum_schedule_counts_optimizer_steps(tmp_path, monkeypatch):
    """r3 review: the cosine-schedule length must count OPTIMIZER steps,
    not loader batches — with grad_accum=K the optimizer advances once
    per K batches, so total_steps must be epochs * (batches // K)
    (otherwise the run ends ~1/K of the way through the decay)."""
    import automoe_tpu.train.loop as L
    from automoe_tpu.data.loader import DataLoader
    from automoe_tpu.train.loop import TrainConfig, Trainer

    captured = {}
    real = L.make_optimizer

    def spy(**kw):
        captured.update(kw)
        return real(**kw)

    monkeypatch.setattr(L, "make_optimizer", spy)

    class _Seg:
        def __len__(self):
            return 32  # 4 loader batches of 8

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {
                "image": r.normal(size=(32, 32, 3)).astype(np.float32),
                "mask": r.integers(0, 3, (32, 32)).astype(np.int32),
            }

    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(_Seg(), batch_size=8, num_workers=0, shuffle=False)

    def cfg(K):
        return TrainConfig(
            epochs=3, learning_rate=1e-3, run_name=f"gs{K}", grad_accum=K,
            ckpt_root=str(tmp_path / "c"), runs_root=str(tmp_path / "r"),
        )

    Trainer(wl, train, train, cfg(2))
    assert captured["total_steps"] == 3 * 2  # 4 batches / K=2 per epoch

    Trainer(wl, train, train, cfg(1))
    assert captured["total_steps"] == 3 * 4

    # non-divisible: the len%K leftover batches run as FULL optimizer
    # steps in _train_epoch_grouped's tail — undercounting them would
    # clamp the cosine at alpha=0 (lr 0) for the back of every epoch
    Trainer(wl, train, train, cfg(3))
    assert captured["total_steps"] == 3 * (1 + 1)  # 4//3 groups + 4%3 tail
