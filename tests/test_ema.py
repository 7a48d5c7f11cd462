"""EMA-of-params (--ema-decay): update math, trainer integration,
checkpoint round-trip, and deploy-side loading.

The reference has no EMA counterpart — this is a production-training
feature (timm/torch ModelEma semantics: ema = d*ema + (1-d)*params per
optimizer step, initialized AT the initial params, no bias correction).
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from automoe_tpu.data.loader import DataLoader
from automoe_tpu.train.loop import TrainConfig, Trainer
from automoe_tpu.train.state import TrainState
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


def test_ema_update_math():
    """apply_gradients folds the EMA update: after k steps,
    ema_k = d*ema_{k-1} + (1-d)*params_k, seeded at params_0."""
    d = 0.5  # large (1-d) so drift is visible
    params = {"w": jnp.asarray([1.0, 2.0])}
    tx = optax.sgd(0.1)
    st = TrainState.create(params=params, tx=tx, ema_decay=d)
    np.testing.assert_array_equal(
        np.asarray(st.ema_params["w"]), np.asarray(params["w"])
    )

    want_p = np.asarray([1.0, 2.0])
    want_e = want_p.copy()
    grads = {"w": jnp.asarray([1.0, -1.0])}
    for _ in range(3):
        st = st.apply_gradients(grads)
        want_p = want_p - 0.1 * np.asarray([1.0, -1.0])
        want_e = want_e * d + want_p * (1.0 - d)
        np.testing.assert_allclose(np.asarray(st.params["w"]), want_p, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(st.ema_params["w"]), want_e, rtol=1e-6
        )


def test_ema_off_by_default():
    st = TrainState.create(params={"w": jnp.zeros(2)}, tx=optax.sgd(0.1))
    assert st.ema_params is None
    st = st.apply_gradients({"w": jnp.ones(2)})
    assert st.ema_params is None


def test_ema_no_aliasing_with_params():
    """create() must deep-copy: the train steps donate the whole state, and
    a donated buffer aliased by two leaves is undefined behavior."""
    params = {"w": jnp.asarray([1.0, 2.0])}
    st = TrainState.create(params=params, tx=optax.sgd(0.1), ema_decay=0.9)
    assert st.ema_params["w"] is not st.params["w"]
    assert not st.ema_params["w"].unsafe_buffer_pointer() == st.params[
        "w"
    ].unsafe_buffer_pointer()


def _mk_trainer(tmp_path, *, ema_decay, epochs=2, steps_per_call=0,
                resume=None, resume_from="last"):
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(
        SyntheticSegDataset(8), batch_size=4, num_workers=1, shuffle=True
    )
    val = DataLoader(
        SyntheticSegDataset(4, seed=1), batch_size=4, num_workers=1,
        shuffle=False, drop_last=False,
    )
    cfg = TrainConfig(
        epochs=epochs, learning_rate=1e-2, run_name="ema",
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
        log_every=1, ema_decay=ema_decay, steps_per_call=steps_per_call,
        resume=resume, resume_from=resume_from,
    )
    return Trainer(wl, train, val, cfg)


def test_trainer_ema_end_to_end(tmp_path):
    """--ema-decay through the whole loop: the EMA diverges from the raw
    params, val_ema metrics are logged, the EMA drives the best decision,
    checkpoints round-trip it, and load_variables(prefer_ema=True) serves
    the EMA weights."""
    tr = _mk_trainer(tmp_path, ema_decay=0.9)
    tr.fit()

    # the EMA lags the raw params (lr is big enough for visible drift)
    p = np.asarray(jax.tree.leaves(tr.state.params)[0])
    e = np.asarray(jax.tree.leaves(tr.state.ema_params)[0])
    assert p.shape == e.shape and not np.allclose(p, e)

    # val_ema metrics logged alongside raw val
    jsonl = tmp_path / "runs" / "bdd_drivable_ema" / "metrics.jsonl"
    lines = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert any("val_ema/loss" in l for l in lines)
    assert any("val/loss" in l for l in lines)

    # resume=full restores ema_params exactly
    tr2 = _mk_trainer(
        tmp_path, ema_decay=0.9, epochs=2, resume="full", resume_from="last"
    )
    for a, b in zip(
        jax.tree.leaves(tr.state.ema_params),
        jax.tree.leaves(tr2.state.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # deploy side: prefer_ema loads EMA into the params slot
    from automoe_tpu.ckpt.checkpoint import load_variables

    template = {"params": tr2.state.params, "batch_stats": tr2.state.batch_stats}
    ckpt = tmp_path / "ckpt" / "bdd_drivable" / "ema" / "last"
    got_ema = load_variables(str(ckpt), template, prefer_ema=True)
    got_raw = load_variables(str(ckpt), template)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(got_ema["params"])[0]), e
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(got_raw["params"])[0]), p
    )


def test_ema_scan_step_equivalence():
    """The EMA update is fused into apply_gradients, so lax.scan of K
    steps advances it exactly like K single-step dispatches (full
    trainers differ by conv-grad reduction-order fp noise; a toy
    quadratic pins the EMA semantics bit-exactly)."""
    from automoe_tpu.train.step import make_scan_train_step, make_train_step

    def loss_fn(params, stats, batch, rng, train):
        loss = jnp.sum((params["w"] - batch["t"]) ** 2)
        return loss, ({}, stats)

    def fresh():
        return TrainState.create(
            params={"w": jnp.asarray([0.0, 0.0])}, tx=optax.sgd(0.1),
            ema_decay=0.5,
        )

    batches = [{"t": jnp.asarray([1.0, -1.0])}, {"t": jnp.asarray([2.0, 0.5])}]
    rng = jax.random.key(0)

    single = make_train_step(loss_fn)
    st_a = fresh()
    for b in batches:
        st_a, _ = single(st_a, b, rng)

    scan = make_scan_train_step(loss_fn)
    stacked = {"t": jnp.stack([b["t"] for b in batches])}
    st_b, _ = scan(fresh(), stacked, rng)

    assert int(st_a.step) == int(st_b.step) == 2
    np.testing.assert_array_equal(
        np.asarray(st_a.ema_params["w"]), np.asarray(st_b.ema_params["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(st_a.params["w"]), np.asarray(st_b.params["w"])
    )
    # and the EMA genuinely lags: not equal to the raw params
    assert not np.allclose(
        np.asarray(st_b.ema_params["w"]), np.asarray(st_b.params["w"])
    )


def test_serve_cli_ema_guards():
    """--ema needs an orbax checkpoint: bare/bundle/.pth forms exit."""
    from automoe_tpu.serving import cli as scli

    with pytest.raises(SystemExit):
        scli.main(["--ema"], block=False)
    with pytest.raises(SystemExit):
        scli.main(["--ema", "--bundle", "x"], block=False)
    with pytest.raises(SystemExit):
        scli.main(["--ema", "--checkpoint", "x.pth"], block=False)


def test_ema_checkpoint_restore_asymmetries(tmp_path):
    """r3 review: EMA presence may differ between checkpoint and run.
    (a) an --ema-decay checkpoint resumes into a NON-ema run (ema on disk
    is ignored); (b) a non-ema checkpoint resumes into an --ema-decay run
    (the EMA seeds at the restored params)."""
    # (a) EMA checkpoint → non-EMA resume
    tr = _mk_trainer(tmp_path / "a", ema_decay=0.9, epochs=1)
    tr.fit()
    tr2 = _mk_trainer(tmp_path / "a", ema_decay=0.0, epochs=1,
                      resume="full", resume_from="last")
    assert tr2.resumed and tr2.state.ema_params is None
    for x, y in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # (b) non-EMA checkpoint → EMA resume: ema seeded at restored params
    tr3 = _mk_trainer(tmp_path / "b", ema_decay=0.0, epochs=1)
    tr3.fit()
    tr4 = _mk_trainer(tmp_path / "b", ema_decay=0.9, epochs=1,
                      resume="full", resume_from="last")
    assert tr4.resumed and tr4.state.ema_params is not None
    for x, y in zip(jax.tree.leaves(tr4.state.params),
                    jax.tree.leaves(tr4.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
