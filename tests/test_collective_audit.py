"""Communication audit: pin the collectives XLA inserts for our sharding
design on the multi-device mesh (8 virtual CPU devices, conftest).

GSPMD data parallelism must reduce gradients across the 'data' axis
exactly like DDP's implicit allreduce (the reference wraps models in
DistributedDataParallel, training/train_bdd100k_ddp.py:497); EP must
all-gather the pooled per-expert features over the 'model' axis
(parallel/ep.py:173). If a refactor silently drops a sharding
annotation, these assertions catch it before any multi-chip run would.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.parallel import MeshSpec, batch_sharding, make_mesh, replicate, shard_batch


def _compiled_hlo(jitted, *args):
    return jitted.lower(*args).compile().as_text()


def _collective_ops(hlo: str):
    """Count collective ops on the RHS of HLO assignments: the op name
    preceded by whitespace and followed by '(' (LHS variable names and
    op_name metadata use '.'/'_' after the name, so they don't match)."""
    ops = {}
    for name in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        ops[name] = len(re.findall(rf"\s{name}(?:-start)?\(", hlo))
    return ops


def test_dp_train_step_allreduces_gradients():
    """The compiled DP train step must contain cross-replica all-reduces
    (gradient reduction) and no accidental all-to-alls."""
    from automoe_tpu.train import TrainState, make_optimizer, make_train_step
    from automoe_tpu.train.workloads import policy_workload

    mesh = make_mesh(MeshSpec(data=8, model=1))
    wl = policy_workload(horizon=4, image_size=32)
    variables = wl.init_variables(jax.random.key(0))
    tx = make_optimizer(learning_rate=1e-3, weight_decay=0.0, total_steps=10)
    state = TrainState.create(
        params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )
    step = make_train_step(wl.loss_fn, mesh=mesh)
    B = 16
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32),
        "waypoints": jnp.asarray(rng.normal(size=(B, 4, 2)), jnp.float32),
        "speed": jnp.asarray(rng.normal(size=(B, 4)), jnp.float32),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    hlo = _compiled_hlo(step, state, batch, jax.random.key(1))
    ops = _collective_ops(hlo)
    assert ops["all-reduce"] >= 1, f"no gradient all-reduce found: {ops}"
    assert ops["all-to-all"] == 0, f"unexpected all-to-all: {ops}"


@pytest.mark.slow
def test_ep_forward_gathers_expert_features(rng):
    """The EP forward must move ONLY pooled [B,256] features across the
    model axis (all-gather), never full expert activation maps."""
    from automoe_tpu.configs import load_model_config
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.parallel.ep import make_ep_forward
    from automoe_tpu.utils import jit_init

    cfg = load_model_config({
        "experts": [
            {"type": "detection", "num_classes": 10},
            {"type": "segmentation", "num_classes": 19},
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    })
    mesh = make_mesh(MeshSpec(data=2, model=4))
    model = create_automoe_model(cfg)
    B, hw = 4, 64
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, hw, hw, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 16, 3), jnp.float32),
        "speed": jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32)),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    variables = jit_init(model, jax.random.key(0), batch)
    ep_fn = make_ep_forward(cfg, mesh)
    hlo = _compiled_hlo(
        ep_fn, jax.device_put(variables, replicate(mesh)),
        shard_batch(batch, mesh),
    )
    ops = _collective_ops(hlo)
    assert ops["all-gather"] + ops["all-reduce"] >= 1, (
        f"no cross-expert collective found: {ops}"
    )
    # the designed ICI payload is B_local x 256 floats per expert — no
    # gathered buffer should be within 4x of a full seg activation map
    gathered = re.findall(r"f32\[([\d,]+)\]\S*\s+all-gather(?:-start)?\(",
                          hlo)
    act_map_elems = B * hw * hw * 19 // 2  # seg logits per data shard
    for dims in gathered:
        elems = int(np.prod([int(d) for d in dims.split(",")]))
        assert elems < act_map_elems // 4, (
            f"all-gather of {dims} looks like a full activation map"
        )
