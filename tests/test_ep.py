"""Expert parallelism: EP forward over a 2x4 mesh ≡ plain AutoMoE."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.configs import load_model_config
from automoe_tpu.models import create_automoe_model
from automoe_tpu.parallel import MeshSpec, make_mesh, replicate, shard_batch
from automoe_tpu.parallel.ep import make_ep_forward
from automoe_tpu.utils import jit_init

CFG = {
    "experts": [
        {"type": "detection", "num_classes": 10},
        {"type": "segmentation", "num_classes": 19},
        {"type": "drivable", "num_classes": 3},
        {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4, "fusion": "sum",
         "use_lidar": False},
    ],
    "gating": {"top_k": 0, "noise_scale": 0.0},
    "context": {"type": "simple"},
    "policy": {"num_waypoints": 4},
}


@pytest.mark.slow
def test_ep_forward_matches_dense(rng):
    cfg = load_model_config(CFG)
    mesh = make_mesh(MeshSpec(data=2, model=4))
    model = create_automoe_model(cfg)

    B = 4  # divides data axis (2)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 16, 3), jnp.float32),
        "speed": jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32)),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    variables = jit_init(model, jax.random.key(0), batch)
    dense = model.apply(variables, batch)

    ep_fn = make_ep_forward(cfg, mesh)
    variables_r = jax.device_put(variables, replicate(mesh))
    ep = ep_fn(variables_r, shard_batch(batch, mesh))

    for key in ("waypoints", "speed_seq", "expert_weights", "gate_logits",
                "combined_features"):
        np.testing.assert_allclose(
            np.asarray(ep[key]), np.asarray(dense[key]), rtol=2e-4, atol=1e-5,
            err_msg=key,
        )


@pytest.mark.slow
def test_ep_gating_train_step_matches_dense(rng):
    """EP train step (grads through switch + shard_map transpose psum)
    ≡ the dense single-device gating train step, with SGD."""
    import optax

    from automoe_tpu.parallel.ep import make_ep_gating_train_step
    from automoe_tpu.train import TrainState, make_train_step
    from automoe_tpu.train.workloads import gating_workload

    cfg = load_model_config(CFG)
    mesh = make_mesh(MeshSpec(data=2, model=4))
    wl = gating_workload(CFG, image_size=64, freeze_experts=False)
    variables = wl.init_variables(jax.random.key(0))
    tx = optax.sgd(0.05)

    B = 4
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 16, 3), jnp.float32),
        "speed": jnp.ones((B, 4), jnp.float32),
        "steering": jnp.zeros((B, 4), jnp.float32),
        "throttle": jnp.zeros((B, 4), jnp.float32),
        "brake": jnp.zeros((B, 4), jnp.float32),
        "waypoints": jnp.asarray(rng.normal(size=(B, 4, 2)).astype(np.float32)),
    }

    def fresh():
        return TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]), tx=tx,
            batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        )

    # dense step (eval-mode loss for comparability: no dropout/BN updates)
    def dense_loss_fn(params, batch_stats, batch, rng_, train):
        return wl.loss_fn(params, batch_stats, batch, rng_, False)

    dense_step = make_train_step(dense_loss_fn)
    s1, m1 = dense_step(fresh(), batch, jax.random.key(1))

    ep_step = make_ep_gating_train_step(CFG, mesh, tx, train=False)
    state_ep = jax.device_put(fresh(), replicate(mesh))
    s2, m2 = ep_step(state_ep, shard_batch(batch, mesh), jax.random.key(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


@pytest.mark.slow
def test_ep_train_mode_matches_dense(rng):
    """ACTUAL train mode (BN batch stats + mutable updates; dropout made
    deterministic for comparability) on a data=1 mesh, where per-shard and
    global batch statistics coincide: EP loss, updated params, AND updated
    batch_stats all match the dense train-mode step (ADVICE r1)."""
    import optax

    from automoe_tpu.losses.trajectory import gating_losses
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.parallel.ep import make_ep_gating_train_step
    from automoe_tpu.train import TrainState, make_train_step

    cfg = load_model_config(CFG)
    mesh = make_mesh(MeshSpec(data=1, model=4), devices=jax.devices()[:4])
    model = create_automoe_model(cfg)

    B = 4
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 16, 3), jnp.float32),
        "speed": jnp.ones((B, 4), jnp.float32),
        "steering": jnp.zeros((B, 4), jnp.float32),
        "throttle": jnp.zeros((B, 4), jnp.float32),
        "brake": jnp.zeros((B, 4), jnp.float32),
        "waypoints": jnp.asarray(rng.normal(size=(B, 4, 2)).astype(np.float32)),
    }
    variables = jit_init(model, jax.random.key(0), batch)
    tx = optax.sgd(0.05)

    def fresh():
        return TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]), tx=tx,
            batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        )

    # dense train-mode step, dropout disabled (deterministic=True) but BN in
    # batch-stat mode with mutable updates — same regime as the EP body
    def dense_loss_fn(params, batch_stats, batch_, rng_, train):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch_, train=True, deterministic=True,
            mutable=["batch_stats"], rngs={"gating": rng_},
        )
        res = gating_losses(out, batch_["waypoints"], batch_["speed"])
        new_stats = updates.get("batch_stats", batch_stats)
        return res["total_loss"], ({}, new_stats)

    dense_step = make_train_step(dense_loss_fn)
    s1, m1 = dense_step(fresh(), batch, jax.random.key(1))

    ep_step = make_ep_gating_train_step(
        CFG, mesh, tx, train=True, dropout_deterministic=True
    )
    state_ep = jax.device_put(fresh(), replicate(mesh))
    s2, m2 = ep_step(state_ep, shard_batch(batch, mesh), jax.random.key(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    # BN running stats updated identically — and actually changed
    l1, l2 = jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)
    l0 = jax.tree.leaves(fresh().batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(z)) for a, z in zip(l1, l0)
    ), "dense train step did not update any batch_stats"
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


@pytest.mark.slow
def test_ep_train_mode_sharded_smoke(rng):
    """Train mode on the full 2x4 mesh: dropout live, BN stats pmean'd
    across data shards — loss finite, stats move, dropout actually fires
    (two different rngs give different losses)."""
    import optax

    from automoe_tpu.parallel.ep import make_ep_gating_train_step
    from automoe_tpu.train import TrainState
    from automoe_tpu.train.workloads import gating_workload

    mesh = make_mesh(MeshSpec(data=2, model=4))
    wl = gating_workload(CFG, image_size=64, freeze_experts=False)
    variables = wl.init_variables(jax.random.key(0))
    tx = optax.sgd(0.05)

    B = 4
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 16, 3), jnp.float32),
        "speed": jnp.ones((B, 4), jnp.float32),
        "steering": jnp.zeros((B, 4), jnp.float32),
        "throttle": jnp.zeros((B, 4), jnp.float32),
        "brake": jnp.zeros((B, 4), jnp.float32),
        "waypoints": jnp.asarray(rng.normal(size=(B, 4, 2)).astype(np.float32)),
    }

    def fresh():
        return TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]), tx=tx,
            batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        )

    ep_step = make_ep_gating_train_step(CFG, mesh, tx, train=True)
    sb = shard_batch(batch, mesh)
    s1, m1 = ep_step(jax.device_put(fresh(), replicate(mesh)), sb, jax.random.key(1))
    s2, m2 = ep_step(jax.device_put(fresh(), replicate(mesh)), sb, jax.random.key(2))
    assert np.isfinite(float(m1["loss"]))
    # dropout is live: different rng → different loss
    assert float(m1["loss"]) != float(m2["loss"])
    # BN stats moved
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(z))
        for a, z in zip(jax.tree.leaves(s1.batch_stats),
                        jax.tree.leaves(fresh().batch_stats))
    )
    assert changed, "EP train step did not update any batch_stats"


@pytest.mark.slow
def test_ep_forward_full_context_matches_dense(rng):
    """EP with the 'full' context extractor (weather/time/road features)
    matches the dense composite — the r1 simple-only restriction is
    lifted; context runs replicated along 'model' like the rest of the
    non-expert graph."""
    cfg = load_model_config({**CFG, "context": {"type": "full"}})
    mesh = make_mesh(MeshSpec(data=2, model=4))
    model = create_automoe_model(cfg)

    B = 4
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 16, 3), jnp.float32),
        "speed": jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32)),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
        "hour": jnp.full((B, 1), 14.0, jnp.float32),
        "minute": jnp.full((B, 1), 30.0, jnp.float32),
        "weather": {
            "rain": jnp.full((B, 1), 0.3, jnp.float32),
            "fog": jnp.zeros((B, 1), jnp.float32),
            "wetness": jnp.full((B, 1), 0.1, jnp.float32),
            "sun_angle": jnp.full((B, 1), 0.7, jnp.float32),
        },
        "road": {
            "road_type": jnp.ones((B, 1), jnp.float32),
            "lane_count": jnp.full((B, 1), 2.0, jnp.float32),
            "curvature": jnp.full((B, 1), 0.05, jnp.float32),
        },
    }
    variables = jit_init(model, jax.random.key(0), batch)
    dense = model.apply(variables, batch)

    ep_fn = make_ep_forward(cfg, mesh)
    ep = ep_fn(
        jax.device_put(variables, replicate(mesh)), shard_batch(batch, mesh)
    )
    for key in ("waypoints", "expert_weights", "context_features",
                "combined_features"):
        np.testing.assert_allclose(
            np.asarray(ep[key]), np.asarray(dense[key]), rtol=2e-4, atol=1e-5,
            err_msg=key,
        )


@pytest.mark.slow
def test_ep_scan_steps_compose(rng):
    """steps_per_call composes with EP: a lax.scan of the EP workload's
    train step (shard_map inside scan) matches two sequential EP steps —
    the Trainer's scan path works for `gating --parallelism ep
    --steps-per-call K`."""
    import optax

    from automoe_tpu.parallel.ep import ep_gating_workload
    from automoe_tpu.parallel.mesh import shard_stacked_batch
    from automoe_tpu.train import (
        TrainState,
        make_scan_train_step,
        make_train_step,
    )

    mesh = make_mesh(MeshSpec(data=2, model=4))
    wl = ep_gating_workload(CFG, mesh, image_size=64, freeze_experts=False)
    variables = wl.init_variables(jax.random.key(0))
    tx = optax.sgd(0.05)

    K, B = 2, 4
    stacked = {
        "image": np.asarray(rng.normal(size=(K, B, 64, 64, 3)), np.float32),
        "lidar": np.zeros((K, B, 16, 3), np.float32),
        "speed": np.ones((K, B, 4), np.float32),
        "steering": np.zeros((K, B, 4), np.float32),
        "throttle": np.zeros((K, B, 4), np.float32),
        "brake": np.zeros((K, B, 4), np.float32),
        "waypoints": np.asarray(rng.normal(size=(K, B, 4, 2)), np.float32),
    }

    def fresh():
        return TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]), tx=tx,
            batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        )

    key = jax.random.key(5)
    seq_step = make_train_step(wl.loss_fn, mesh=mesh)
    s1 = jax.device_put(fresh(), replicate(mesh))
    seq_losses = []
    for i in range(K):
        b = {k: v[i] for k, v in stacked.items()}
        s1, m = seq_step(s1, shard_batch(b, mesh), key)
        seq_losses.append(float(m["loss"]))

    scan_step = make_scan_train_step(wl.loss_fn, mesh=mesh)
    s2, m2 = scan_step(
        jax.device_put(fresh(), replicate(mesh)),
        shard_stacked_batch(stacked, mesh),
        key,
    )
    np.testing.assert_allclose(
        np.asarray(seq_losses), np.asarray(m2["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        )
