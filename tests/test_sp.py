"""Spatial partitioning (parallel/sp.py) tests.

sp shards the image HEIGHT axis over the 'model' mesh axis; XLA/GSPMD
inserts the conv halo exchanges and the sync-BN reductions. These tests
pin (a) the sharding specs, (b) numerical equivalence of sp training
with fully-replicated DP training on the virtual 8-device mesh, and
(c) the Trainer/CLI guard rails. The reference has no counterpart
(DDP replicates every activation — SURVEY.md §2.2); equivalence is
against our own DP path, which is itself pinned to the reference.
"""
from __future__ import annotations

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from automoe_tpu.parallel import MeshSpec, make_mesh, shard_batch
from automoe_tpu.parallel.sp import (
    shard_batch_spatial,
    spatial_batch_shardings,
    with_spatial_gather,
)
from automoe_tpu.train import TrainState, make_optimizer, make_train_step
from automoe_tpu.train.step import make_eval_step
from automoe_tpu.train.workloads import bdd_expert_workload


def _seg_batches(n, b=8, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "image": rng.normal(size=(b, size, size, 3)).astype(np.float32),
            "mask": rng.integers(0, 3, (b, size, size)).astype(np.int32),
        }
        for _ in range(n)
    ]


def test_spatial_batch_shardings_specs():
    mesh = make_mesh(MeshSpec(data=2, model=4))
    batch = _seg_batches(1)[0]
    sh = spatial_batch_shardings(batch, mesh)
    assert sh["image"].spec == P("data", "model")
    assert sh["mask"].spec == P("data")

    placed = shard_batch_spatial(batch, mesh)
    assert placed["image"].sharding.spec == P("data", "model")
    assert placed["mask"].sharding.spec == P("data")


def test_spatial_requires_divisible_height():
    mesh = make_mesh(MeshSpec(data=2, model=4))
    batch = {"image": np.zeros((4, 30, 32, 3), np.float32)}
    with pytest.raises(ValueError, match="divisible"):
        spatial_batch_shardings(batch, mesh)


def test_sp_training_matches_replicated():
    """sp training must compute the same math as DP training. Without
    `with_spatial_gather` this test FAILS for real: at 32² the deep
    layers' H (2, 1) drops below model=4 and XLA's GSPMD backward
    miscompiles the residual blocks — gradients come out globally
    ~2.4x wrong while forward losses still agree (parallel/sp.py
    docstring; minimal repro ledgered in docs/DESIGN.md). With the
    gather interceptor the sp step is pure reduction-order noise off
    DP. Trajectory chaos amplifies one-step noise per step (the r2
    Adam-noise ledger entry), so the assertions are: TIGHT one-step
    equivalence (the sharding math), LOOSE 3-step loss trajectory
    (no systematic divergence)."""
    wl = bdd_expert_workload("drivable", image_size=32)
    variables = jax.device_get(wl.init_variables(jax.random.key(0)))
    batches = _seg_batches(3)

    def run(mesh, spatial, n_steps):
        # SGD isolates the sharding math from Adam's fp-noise
        # amplification (same rationale as test_tp.py)
        tx = make_optimizer(
            learning_rate=1e-3, weight_decay=0.0, total_steps=3,
            optimizer="sgd",
        )
        state = TrainState.create(
            params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        loss_fn = with_spatial_gather(wl.loss_fn, mesh) if spatial else wl.loss_fn
        step = make_train_step(
            loss_fn, mesh=mesh,
            **({"batch_shardings": None} if spatial else {}),
        )
        place = shard_batch_spatial if spatial else shard_batch
        losses = []
        for bt in batches[:n_steps]:
            state, m = step(state, place(bt, mesh), jax.random.key(1))
            losses.append(float(m["loss"]))
        return jax.device_get((state.params, state.batch_stats)), losses

    mesh_dp = make_mesh(MeshSpec(data=8, model=1))
    mesh_sp = make_mesh(MeshSpec(data=2, model=4))

    # one step: every state leaf within absolute fp-noise of DP
    (p_dp, bs_dp), l_dp1 = run(mesh_dp, False, 1)
    (p_sp, bs_sp), l_sp1 = run(mesh_sp, True, 1)
    np.testing.assert_allclose(l_dp1, l_sp1, rtol=1e-5)
    for tree_a, tree_b, tag in ((p_dp, p_sp, "params"), (bs_dp, bs_sp, "bn")):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(tree_a),
            jax.tree_util.tree_leaves_with_path(tree_b),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f"{tag}:{jax.tree_util.keystr(pa)}",
            )

    # trajectory: no systematic divergence over 3 steps
    _, l_dp = run(mesh_dp, False, 3)
    _, l_sp = run(mesh_sp, True, 3)
    np.testing.assert_allclose(l_dp, l_sp, rtol=5e-3)


def test_sp_eval_matches_replicated():
    wl = bdd_expert_workload("drivable", image_size=32)
    variables = jax.device_get(wl.init_variables(jax.random.key(0)))
    batch = _seg_batches(1)[0]
    tx = make_optimizer(learning_rate=1e-3, weight_decay=0.0, total_steps=1)
    state = TrainState.create(
        params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )

    mesh_dp = make_mesh(MeshSpec(data=8, model=1))
    m_dp = make_eval_step(wl.loss_fn, mesh=mesh_dp)(
        state, shard_batch(batch, mesh_dp), jax.random.key(1)
    )
    mesh_sp = make_mesh(MeshSpec(data=2, model=4))
    m_sp = make_eval_step(
        with_spatial_gather(wl.loss_fn, mesh_sp), mesh=mesh_sp,
        batch_shardings=None,
    )(state, shard_batch_spatial(batch, mesh_sp), jax.random.key(1))
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_sp["loss"]), rtol=1e-5, atol=1e-6
    )


def test_aot_v5e_sp_train_step_halos_and_memory():
    """Deviceless AOT against the real v5e-8 topology (2 data x 4 model):
    the sp train step's HLO must contain collective-permute (the halo
    row exchange GSPMD inserts for overlapping conv windows over the
    sharded H axis) and its activation/temp memory must undercut the
    same mesh WITHOUT spatial sharding. The scenario sp exists for: the
    batch only splits 2 ways (B=8 here stands in for few-huge-frames);
    on a 2x4 mesh plain DP leaves the 'model' axis idle and each chip
    holds B/2 full-resolution activations — spatial sharding splits H
    4 ways on top, ~4x activation headroom. 128² keeps activations
    dominant so the saving shows in temp_size while the two AOT
    compiles stay ~1 min each on this host (256² takes >9 min)."""
    pytest.importorskip("jax.experimental.topologies")
    import re

    from jax.experimental import topologies
    from jax.sharding import Mesh

    try:
        td = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
    except Exception as e:
        pytest.skip(f"deviceless TPU topology unavailable: {e}")

    wl = bdd_expert_workload("drivable", image_size=128)
    variables = wl.init_variables(jax.random.key(0))
    batch = {
        "image": np.zeros((8, 128, 128, 3), np.float32),
        "mask": np.zeros((8, 128, 128), np.int32),
    }
    rng = jax.random.key(1)

    def compile_step(mesh, spatial):
        tx = make_optimizer(
            learning_rate=1e-3, weight_decay=1e-4, total_steps=10
        )
        state = TrainState.create(
            params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        loss_fn = with_spatial_gather(wl.loss_fn, mesh) if spatial else wl.loss_fn
        batch_sh = (
            spatial_batch_shardings(batch, mesh) if spatial else None
        )
        step = make_train_step(
            wl.loss_fn if not spatial else loss_fn, mesh=mesh,
            **({"batch_shardings": batch_sh} if spatial else {}),
        )
        ab = lambda tree: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            tree,
        )
        rng_ab = jax.ShapeDtypeStruct(
            np.shape(rng), jax.dtypes.result_type(rng)
        )
        return step.lower(ab(state), ab(batch), rng_ab).compile()

    mesh = Mesh(np.asarray(td.devices).reshape(2, 4), ("data", "model"))
    c_dp = compile_step(mesh, False)   # P('data') only: 'model' idle
    c_sp = compile_step(mesh, True)    # H over 'model' on top

    colls = set(
        re.findall(
            r"all-reduce|all-gather|reduce-scatter|collective-permute",
            c_sp.as_text(),
        )
    )
    assert "collective-permute" in colls, colls  # the halo exchanges
    assert "all-reduce" in colls, colls  # grad reduce + sync-BN stats

    t_dp = c_dp.memory_analysis().temp_size_in_bytes
    t_sp = c_sp.memory_analysis().temp_size_in_bytes
    # the whole point: materially less live activation memory per chip
    # (nominal 4x on the sharded stages; assert a conservative 2x so
    # XLA layout/fusion churn between versions can't flake the test)
    assert t_sp < t_dp / 2, (t_dp, t_sp)
    print(f"temp bytes: dp={t_dp/2**20:.1f} MiB sp={t_sp/2**20:.1f} MiB")


def test_trainer_spatial_guards():
    from automoe_tpu.train.loop import TrainConfig, Trainer

    wl = bdd_expert_workload("drivable", image_size=32)
    with pytest.raises(ValueError, match="model"):
        Trainer(wl, [], None, TrainConfig(spatial=True),
                mesh=make_mesh(MeshSpec(data=8, model=1)))
    with pytest.raises(ValueError, match="model"):
        Trainer(wl, [], None, TrainConfig(spatial=True), mesh=None)
    with pytest.raises(ValueError, match="exclusive"):
        Trainer(wl, [], None, TrainConfig(spatial=True, steps_per_call=2),
                mesh=make_mesh(MeshSpec(data=2, model=4)))
