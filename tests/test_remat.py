"""Rematerialisation (per-block nn.remat in ResNet18Backbone) tests.

`remat=True` on the expert workloads checkpoints each backbone
BasicBlock: the backward recomputes one block at a time instead of
holding the whole stack's activations. Pins: (a) the param/batch_stats
tree is IDENTICAL with remat on or off (nn.remat is a name-preserving
lifted transform — torchvision import and checkpoints are unaffected),
(b) the math is unchanged (same loss, same one-step updates),
(c) the memory claim is real — the v5e AOT compile's temp (activation)
footprint drops, (d) a Trainer fit over a remat workload runs.
No reference counterpart (/root/reference/training/* never uses torch
activation checkpointing).

Design note: a raw `jax.checkpoint` over the whole loss_fn was tried
first and rejected — flax's mutable batch_stats collection crossing the
checkpoint boundary leaks tracers (flax lifts transforms through
Module scope for exactly this reason), hence nn.remat inside the
backbone rather than a wrapper in train/step.py.
"""
from __future__ import annotations

import os

import jax
import numpy as np
import pytest

from automoe_tpu.parallel import MeshSpec, make_mesh, shard_batch
from automoe_tpu.train import TrainState, make_optimizer, make_train_step
from automoe_tpu.train.workloads import bdd_expert_workload


def _state(variables):
    tx = make_optimizer(
        learning_rate=1e-3, weight_decay=0.0, total_steps=3, optimizer="sgd"
    )
    return TrainState.create(
        params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def test_remat_param_tree_identical():
    """nn.remat must not rename or restructure anything: the init tree
    (paths + shapes) is bit-identical in structure to the plain one."""
    wl_a = bdd_expert_workload("drivable", image_size=32)
    wl_b = bdd_expert_workload("drivable", image_size=32, remat=True)
    va = jax.eval_shape(lambda k: wl_a.model.init(k, wl_a.example_batch["image"]),
                        jax.random.key(0))
    vb = jax.eval_shape(lambda k: wl_b.model.init(k, wl_b.example_batch["image"]),
                        jax.random.key(0))
    pa = [(p, x.shape, x.dtype) for p, x in
          jax.tree_util.tree_leaves_with_path(va)]
    pb = [(p, x.shape, x.dtype) for p, x in
          jax.tree_util.tree_leaves_with_path(vb)]
    assert pa == pb


def test_remat_step_matches_plain():
    """One SGD step with remat == one step without: recomputation must
    not change the math (loss, params, BN stats)."""
    wl_a = bdd_expert_workload("drivable", image_size=32)
    wl_b = bdd_expert_workload("drivable", image_size=32, remat=True)
    variables = jax.device_get(wl_a.init_variables(jax.random.key(0)))
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "mask": rng.integers(0, 3, (8, 32, 32)).astype(np.int32),
    }
    mesh = make_mesh(MeshSpec(data=8, model=1))
    db = shard_batch(batch, mesh)

    out = {}
    for tag, wl in {"plain": wl_a, "remat": wl_b}.items():
        step = make_train_step(wl.loss_fn, mesh=mesh)
        st, m = step(_state(variables), db, jax.random.key(1))
        out[tag] = (jax.device_get((st.params, st.batch_stats)), float(m["loss"]))

    (p_a, bs_a), l_a = out["plain"]
    (p_b, bs_b), l_b = out["remat"]
    np.testing.assert_allclose(l_a, l_b, rtol=1e-6)
    for tree_a, tree_b in ((p_a, p_b), (bs_a, bs_b)):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(tree_a),
            jax.tree_util.tree_leaves_with_path(tree_b),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
                err_msg=jax.tree_util.keystr(pa),
            )


def test_trainer_runs_remat_workload(tmp_path):
    """The Trainer path the CLI's --remat flag reaches (factory remat →
    model-level nn.remat) fits end-to-end."""
    from automoe_tpu.data.loader import DataLoader
    from automoe_tpu.train.loop import TrainConfig, Trainer

    class _Seg:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {
                "image": r.normal(size=(32, 32, 3)).astype(np.float32),
                "mask": r.integers(0, 3, (32, 32)).astype(np.int32),
            }

    wl = bdd_expert_workload("drivable", image_size=32, remat=True)
    train = DataLoader(_Seg(), batch_size=8, num_workers=0, shuffle=False)
    cfg = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="rm",
        ckpt_root=str(tmp_path / "c"), runs_root=str(tmp_path / "r"),
        save_freq=1, log_every=1,
    )
    tr = Trainer(wl, train, train, cfg, mesh=make_mesh(MeshSpec(data=8, model=1)))
    out = tr.fit()
    assert np.isfinite(out["best_val_loss"])


def test_cli_remat_flag_reaches_factory(monkeypatch):
    """`automoe-train bdd --remat` must construct the workload with
    remat=True (the flag is factory-routed, not TrainConfig-routed)."""
    from automoe_tpu.train import cli as tcli

    seen = {}

    def fake_workload(*a, **kw):
        seen.update(kw)
        raise SystemExit(0)  # stop before loaders/Trainer

    monkeypatch.setattr(tcli.W, "bdd_expert_workload", fake_workload)
    monkeypatch.setattr(tcli, "_init_backend", lambda args: None)
    with pytest.raises(SystemExit):
        tcli.main(["bdd", "--task", "drivable", "--remat", "--no-mesh"])
    assert seen.get("remat") is True


def test_remat_recomputes_backbone_convs():
    """Semantic pin, compile-free: the remat backward must actually
    recompute the forward convs (that's the FLOPs-for-HBM trade).
    Counted on the lowered (pre-optimization) StableHLO of grad(loss):
    the remat program carries ~one extra forward's worth of
    convolution ops over the plain one."""
    wl_a = bdd_expert_workload("drivable", image_size=32)
    wl_b = bdd_expert_workload("drivable", image_size=32, remat=True)
    variables = jax.eval_shape(
        lambda k: wl_a.init_variables(k), jax.random.key(0)
    )
    batch = {
        "image": jax.ShapeDtypeStruct((8, 32, 32, 3), np.float32),
        "mask": jax.ShapeDtypeStruct((8, 32, 32), np.int32),
    }
    rng = jax.random.key(0)

    def n_convs(wl):
        def loss(params, bs, b):
            out = wl.loss_fn(params, bs, b, rng, True)
            return out[0]

        txt = (
            jax.jit(jax.grad(loss))
            .lower(variables["params"], variables["batch_stats"], batch)
            .as_text()
        )
        return txt.count("stablehlo.convolution")

    plain, remat = n_convs(wl_a), n_convs(wl_b)
    # ResNet-18's 8 BasicBlocks hold 2 convs each (+3 downsample 1x1s);
    # each is re-run once in the remat backward
    assert remat >= plain + 16, (plain, remat)


@pytest.mark.slow  # two deviceless v5e AOT compiles, ~8 min on CPU
@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_AOT"),
    reason="two deviceless v5e AOT compiles of the full train step take "
           "~10 min (the AOT result can't hit the compile cache: "
           "DeserializeLoadedExecutable unimplemented) — run separately "
           "with RUN_SLOW_AOT=1 and a ~700 s budget",
)
def test_aot_v5e_remat_memory_cut():
    """The memory claim, measured: AOT-compile the drivable train step
    against the real v5e-8 topology with and without remat — the remat
    program's temp (live activation) footprint must drop.

    The threshold is the measured end-to-end cut (82.4 → 67.5 MiB at
    128²/B=32 on this stack, ~18%), not the backbone-local ~2× — the
    drivable decoder upsamples logits to full resolution and the
    CE/one-hot temps on that path dominate the step's temp and are
    untouched by backbone remat. test_remat_recomputes_backbone_convs
    pins that the recomputation itself is real; this pins that it
    shows up in the v5e memory analysis."""
    pytest.importorskip("jax.experimental.topologies")
    from jax.experimental import topologies
    from jax.sharding import Mesh

    try:
        td = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
    except Exception as e:
        pytest.skip(f"deviceless TPU topology unavailable: {e}")

    mesh = Mesh(np.asarray(td.devices).reshape(8, 1), ("data", "model"))
    wl_a = bdd_expert_workload("drivable", image_size=128)
    wl_b = bdd_expert_workload("drivable", image_size=128, remat=True)
    variables = wl_a.init_variables(jax.random.key(0))
    batch = {
        "image": np.zeros((32, 128, 128, 3), np.float32),
        "mask": np.zeros((32, 128, 128), np.int32),
    }
    rng = jax.random.key(1)

    def compile_step(wl):
        step = make_train_step(wl.loss_fn, mesh=mesh)
        ab = lambda tree: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            tree,
        )
        rng_ab = jax.ShapeDtypeStruct(
            np.shape(rng), jax.dtypes.result_type(rng)
        )
        return step.lower(
            ab(_state(variables)), ab(batch), rng_ab
        ).compile()

    t_plain = compile_step(wl_a).memory_analysis().temp_size_in_bytes
    t_remat = compile_step(wl_b).memory_analysis().temp_size_in_bytes
    assert t_remat < 0.9 * t_plain, (t_plain, t_remat)
    print(
        f"temp bytes: plain={t_plain/2**20:.1f} MiB "
        f"remat={t_remat/2**20:.1f} MiB"
    )
