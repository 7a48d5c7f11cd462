"""Deep pipelineable policy trunk (models/deep_policy.py) + its
pipeline-parallel training path (parallel/pp.py::grouped_pipeline_apply,
TrainConfig.pp_microbatches) — PP wired to a PRODUCT model, not the toy
MLP stack (VERDICT r3 item 3).

Pins: (a) pipelined forward ≡ sequential forward, (b) 3 AdamW train
steps on the (data=2, model=4) mesh with stage-sharded params ≡ the
unsharded single-device trajectory (exact leaf match at fp tolerance —
no BN anywhere and no conv biases under norms, so there are no
zero-gradient noise leaves; see models/deep_policy.py design notes),
(c) the pp_state_shardings placement rule (trunk params + Adam moments
per stage, everything else replicated), (d) the CLI end-to-end
(`policy --trunk-depth --pp-microbatches`), (e) a deviceless v5e-8 AOT
compile of the PP train step carrying collective-permute with the
stacked trunk params ACTUALLY stage-sharded (argument bytes drop ~S× on
the trunk), (f) [RUN_SLOW_AOT] the growth-path memory claim: a config
whose train step exceeds one v5e chip's 16 GiB HBM but fits pipelined
over 8 stages.

The reference has no PP and no deep policy (its trajectory head is 4
convs — models/policy/trajectory_head.py:5-62); equivalence is against
our own sequential semantics.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.torch_mirror import install_torchvision_stub

install_torchvision_stub()

from automoe_tpu.models.deep_policy import (  # noqa: E402
    DeepTrajectoryPolicy,
    PIPELINE_BLOCKS,
)
from automoe_tpu.parallel import MeshSpec, make_mesh, shard_batch  # noqa: E402
from automoe_tpu.parallel.pp import (  # noqa: E402
    grouped_pipeline_apply,
    pp_shard_state,
    pp_state_shardings,
)
from automoe_tpu.train.state import TrainState, make_optimizer  # noqa: E402
from automoe_tpu.train.step import make_train_step  # noqa: E402
from automoe_tpu.train.workloads import policy_workload  # noqa: E402

B, S, H = 8, 32, 4
WL_KW = dict(horizon=H, image_size=S, trunk_depth=8, trunk_width=16,
             backbone_dim=32)


def _batch(rng):
    return {
        "image": rng.normal(size=(B, S, S, 3)).astype(np.float32),
        "waypoints": rng.normal(size=(B, H, 2)).astype(np.float32),
        "speed": rng.uniform(0, 10, (B, H)).astype(np.float32),
    }


def test_deep_policy_pipeline_forward_matches_sequential(rng):
    model = DeepTrajectoryPolicy(
        horizon=H, depth=8, width=16, groups=4, backbone_dim=32
    )
    img = rng.normal(size=(B, S, S, 3)).astype(np.float32)
    vs = jax.jit(lambda k: model.init(k, jnp.asarray(img)))(jax.random.key(0))
    ref = model.apply(vs, img)
    mesh = make_mesh(MeshSpec(data=2, model=4))
    for M in (1, 2, 4):
        out = model.apply(
            vs, img,
            trunk_apply=functools.partial(
                grouped_pipeline_apply, mesh=mesh, microbatches=M
            ),
        )
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]),
                rtol=2e-5, atol=1e-6, err_msg=f"{k} M={M}",
            )


def test_deep_policy_pp_training_matches_single_device(rng):
    batch = _batch(rng)
    wl_seq = policy_workload(**WL_KW)
    mesh = make_mesh(MeshSpec(data=2, model=4))
    wl_pp = policy_workload(
        **WL_KW, pipeline_mesh=mesh, pipeline_microbatches=2
    )
    params = jax.device_get(
        wl_seq.init_variables(jax.random.key(0))["params"]
    )

    def fresh():
        tx = make_optimizer(
            learning_rate=1e-3, weight_decay=1e-4, total_steps=10
        )
        return TrainState.create(
            params=jax.tree.map(jnp.asarray, params), tx=tx, batch_stats={}
        )

    st_a = fresh()
    step_a = make_train_step(wl_seq.loss_fn)
    for t in range(3):
        st_a, ma = step_a(st_a, batch, jax.random.key(t))

    st_b, sh = pp_shard_state(fresh(), mesh)
    step_b = make_train_step(wl_pp.loss_fn, mesh=mesh, state_sharding=sh)
    db = shard_batch(batch, mesh)
    for t in range(3):
        st_b, mb = step_b(st_b, db, jax.random.key(t))

    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=1e-6
    )
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(st_a.params)[0],
        jax.tree_util.tree_flatten_with_path(st_b.params)[0],
    ):
        key = jax.tree_util.keystr(pa)
        assert key == jax.tree_util.keystr(pb)
        # sharded matmuls change the reduction order; Adam's sqrt(v)
        # rescaling amplifies that fp noise on near-zero second moments
        # (measured: 1/262144 elements at abs 2.9e-5 after 3 steps)
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(jax.device_get(lb)),
            rtol=1e-4, atol=5e-5, err_msg=key,
        )


def test_pp_state_sharding_rule(rng):
    wl = policy_workload(**WL_KW)
    variables = wl.init_variables(jax.random.key(0))
    tx = make_optimizer(learning_rate=1e-3, weight_decay=0.0, total_steps=4)
    state = TrainState.create(
        params=variables["params"], tx=tx, batch_stats={}
    )
    mesh = make_mesh(MeshSpec(data=2, model=4))
    sh = pp_state_shardings(state, mesh)
    staged, repl = [], []
    for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]:
        keys = jax.tree_util.keystr(path)
        (staged if "model" in str(s.spec) else repl).append(keys)
    # params: 6 stacked trunk leaves; Adam keeps 2 moment copies → ≥18
    assert sum(PIPELINE_BLOCKS in k for k in staged) == len(staged) >= 18
    assert all(PIPELINE_BLOCKS not in k for k in repl)
    assert any("head_wp" in k for k in repl)  # heads replicated

    # placement executes: stage leaves land split on their leading axis
    placed, _ = pp_shard_state(state, mesh)
    leaf = placed.params[PIPELINE_BLOCKS]["conv1"]
    assert "model" in str(leaf.sharding.spec)


def test_cli_pp_one_epoch(tmp_path, rng):
    """`policy --trunk-depth 8 --pp-microbatches 2 --model-axis 4` trains
    end-to-end through the Trainer on the 2x4 virtual mesh."""
    import torch

    from automoe_tpu.train.cli import main as train_main
    from tests.test_data import _make_carla_frame

    root = tmp_path / "carla"
    for split in ("train", "val"):
        d = root / split / "run_001"
        d.mkdir(parents=True)
        for t in range(12):
            torch.save(
                _make_carla_frame(rng, frame_id=t, run_id="run_001"),
                d / f"{t:04d}.pt",
            )
    out = train_main([
        "policy", "--horizon", "4",
        "--data-root", str(root),
        "--epochs", "1", "--batch-size", "4", "--num-workers", "1",
        "--image-size", "32",
        "--trunk-depth", "8", "--trunk-width", "16",
        "--pp-microbatches", "2", "--model-axis", "4",
        "--ckpt-root", str(tmp_path / "ckpt"),
        "--runs-root", str(tmp_path / "runs"),
        "--run-name", "pp_cli",
    ])
    assert np.isfinite(out["best_val_loss"])
    assert (tmp_path / "ckpt" / "carla_policy" / "pp_cli" / "best").exists()


def test_cli_pp_validation():
    from automoe_tpu.train.cli import main as train_main

    with pytest.raises(SystemExit, match="trunk-depth > 0"):
        train_main([
            "policy", "--epochs", "1", "--pp-microbatches", "2",
            "--model-axis", "4",
        ])
    with pytest.raises(SystemExit, match="model-axis"):
        train_main([
            "policy", "--epochs", "1", "--trunk-depth", "8",
            "--pp-microbatches", "2",
        ])


def _v5e_topology():
    pytest.importorskip("jax.experimental.topologies")
    from jax.experimental import topologies

    try:
        return topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"deviceless TPU topology unavailable: {e}")


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tree,
    )


def _compile_pp_step(mesh, *, depth, width, image, batch, micro,
                     sharded: bool):
    # micro=0 → plain sequential trunk (the single-chip baseline)
    wl = policy_workload(
        horizon=H, image_size=image, trunk_depth=depth, trunk_width=width,
        backbone_dim=64,
        pipeline_mesh=mesh if micro else None,
        pipeline_microbatches=micro,
    )
    variables = jax.eval_shape(
        lambda k: wl.model.init(k, jnp.zeros((2, image, image, 3))),
        jax.random.key(0),
    )
    tx = make_optimizer(learning_rate=1e-3, weight_decay=0.0, total_steps=4)
    state = jax.eval_shape(
        lambda v: TrainState.create(
            params=v["params"], tx=tx, batch_stats={}
        ),
        variables,
    )
    sh = pp_state_shardings(state, mesh) if sharded else None
    step = make_train_step(wl.loss_fn, mesh=mesh, state_sharding=sh)
    abatch = _abstract({
        "image": np.zeros((batch, image, image, 3), np.float32),
        "waypoints": np.zeros((batch, H, 2), np.float32),
        "speed": np.zeros((batch, H), np.float32),
    })
    rng = jax.random.key(1)
    rng_ab = jax.ShapeDtypeStruct(np.shape(rng), jax.dtypes.result_type(rng))
    return step.lower(state, abatch, rng_ab).compile()


def test_aot_v5e_deep_policy_pp_stage_sharding():
    """Deviceless v5e-8 AOT of the PRODUCT deep-policy PP train step: the
    compiled program carries collective-permute (stage hops over ICI)
    and the stacked trunk params are genuinely stage-split — per-device
    argument bytes drop vs the same step with replicated state."""
    td = _v5e_topology()
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(td.devices).reshape(2, 4), ("data", "model"))
    kw = dict(depth=8, width=64, image=64, batch=8, micro=2)
    pp = _compile_pp_step(mesh, **kw, sharded=True)
    hlo = pp.as_text()
    assert "collective-permute" in hlo
    repl = _compile_pp_step(mesh, **kw, sharded=False)
    a_pp = pp.memory_analysis().argument_size_in_bytes
    a_repl = repl.memory_analysis().argument_size_in_bytes
    # trunk params+moments dominate the arguments; 4 stages → ~4x cut on
    # that share. Require a robust >35% total drop.
    assert a_pp < 0.65 * a_repl, (a_pp, a_repl)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_AOT"),
    reason="two deviceless v5e AOT compiles of a 64-block 512-wide trunk "
           "(~minutes each, uncacheable) — scripts/slow_lane.sh runs this",
)
def test_aot_v5e_pp_memory_growth_path():
    """The growth-path claim, measured (VERDICT r3 item 3): a deep-policy
    config (64 residual blocks x 512ch on 64x64 maps, B=32 fp32) whose
    single-chip train step CANNOT fit a v5e's 16 GiB HBM, but whose
    8-stage pipelined step fits per device with room — the configuration
    PP exists for, pinned by XLA's own memory analysis on the real v5e
    topology."""
    td = _v5e_topology()
    from jax.sharding import Mesh

    V5E_HBM = 16 * 2**30
    kw = dict(depth=64, width=512, image=256, batch=32)

    mesh1 = Mesh(np.asarray(td.devices)[:1].reshape(1, 1), ("data", "model"))
    # This toolchain's deviceless TPU compiler enforces the HBM budget at
    # compile time: the single-chip compile of this config ABORTS with
    # RESOURCE_EXHAUSTED (measured 2026-08-19: a 32 GiB allocation vs the
    # 16 GiB space) rather than returning an executable to memory_analysis.
    # That abort IS the does-not-fit evidence; older stacks that compile
    # anyway fall through to the memory-analysis comparison.
    try:
        one = _compile_pp_step(
            mesh1, **kw, micro=0, sharded=False
        ).memory_analysis()
        single = (one.argument_size_in_bytes + one.output_size_in_bytes
                  + one.temp_size_in_bytes)
    except Exception as e:  # jax.errors.JaxRuntimeError
        assert "RESOURCE_EXHAUSTED" in repr(e), e
        single = float("inf")

    mesh8 = Mesh(np.asarray(td.devices).reshape(1, 8), ("data", "model"))
    pp = _compile_pp_step(mesh8, **kw, micro=8, sharded=True).memory_analysis()
    piped = (pp.argument_size_in_bytes + pp.output_size_in_bytes
             + pp.temp_size_in_bytes)

    print(f"single-chip: {single/2**30:.2f} GiB; "
          f"pp 8-stage/device: {piped/2**30:.2f} GiB "
          f"(v5e HBM {V5E_HBM/2**30:.0f} GiB)")
    assert single > V5E_HBM, single     # genuinely does not fit one chip
    assert piped < 0.8 * V5E_HBM, piped  # fits pipelined, with headroom
