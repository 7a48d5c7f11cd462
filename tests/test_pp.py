"""Pipeline parallelism (parallel/pp.py) tests.

pp runs S shape-preserving blocks as a GPipe-style scan+ppermute
pipeline inside shard_map, one stage per 'model' device. These pin:
(a) forward equivalence with running the blocks sequentially on one
device, (b) GRADIENT equivalence (the backward schedule is jax.grad of
the traced pipeline — ppermute/psum transposes, never hand-written),
(c) microbatch-count invariance, (d) composition with data parallelism
on the 2x4 mesh, (e) input validation. The reference has no PP
(SURVEY.md §2.2 lists it absent); equivalence is against our own
sequential semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.parallel import MeshSpec, make_mesh
from automoe_tpu.parallel.pp import (
    init_mlp_stack,
    mlp_block,
    pipeline_apply,
    sequential_apply,
    stage_param_sharding,
)


def _setup(S=4, B=16, D=32, H=64, seed=0):
    params = init_mlp_stack(seed, S, D, H)
    x = np.random.default_rng(seed + 1).normal(size=(B, D)).astype(
        np.float32
    )
    return params, x


def test_pp_forward_matches_sequential():
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params, x = _setup()
    y_ref = jax.jit(lambda p, h: sequential_apply(mlp_block, p, h))(
        params, x
    )
    placed = jax.device_put(params, stage_param_sharding(mesh))
    for M in (1, 2, 8):  # bubble-heavy through per-sample microbatches
        y = jax.jit(
            lambda p, h, M=M: pipeline_apply(
                mlp_block, p, h, mesh, microbatches=M
            )
        )(placed, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-6,
            err_msg=f"microbatches={M}",
        )


def test_pp_grads_match_sequential():
    """jax.grad of the pipelined forward == grad of the sequential
    forward, for BOTH the stacked stage params and the input batch —
    the automatic reverse pipeline computes the right thing."""
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params, x = _setup()

    def loss_seq(p, h):
        return jnp.mean(sequential_apply(mlp_block, p, h) ** 2)

    def loss_pp(p, h):
        return jnp.mean(
            pipeline_apply(mlp_block, p, h, mesh, microbatches=4) ** 2
        )

    l_ref, (gp_ref, gx_ref) = jax.jit(
        jax.value_and_grad(loss_seq, argnums=(0, 1))
    )(params, x)
    placed = jax.device_put(params, stage_param_sharding(mesh))
    l_pp, (gp_pp, gx_pp) = jax.jit(
        jax.value_and_grad(loss_pp, argnums=(0, 1))
    )(placed, x)

    np.testing.assert_allclose(float(l_ref), float(l_pp), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gx_pp), np.asarray(gx_ref), rtol=1e-5, atol=1e-6
    )
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp_pp[k]), np.asarray(gp_ref[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_pp_training_step_converges():
    """A few SGD steps through the pipeline reduce the loss — the
    end-to-end train-ability check (placed params stay stage-sharded)."""
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params, x = _setup()
    y_tgt = np.random.default_rng(9).normal(size=x.shape).astype(
        np.float32
    )

    @jax.jit
    def step(p, h, t):
        def loss(p):
            out = pipeline_apply(mlp_block, p, h, mesh, microbatches=4)
            return jnp.mean((out - t) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        # lr 3e-3: measured stable for this 4-block residual trunk
        # (1e-2 transiently diverges before recovering)
        return l, jax.tree.map(lambda a, b: a - 3e-3 * b, p, g)

    p = jax.device_put(params, stage_param_sharding(mesh))
    losses = []
    for _ in range(8):
        l, p = step(p, x, y_tgt)
        losses.append(float(l))
    assert losses[-1] < 0.2 * losses[0], losses
    # params never left their stage devices
    from jax.sharding import PartitionSpec as P

    assert p["w1"].sharding.spec == P("model")


def test_pp_validation():
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params, x = _setup(B=16)
    with pytest.raises(ValueError, match="divide"):
        pipeline_apply(mlp_block, params, x, mesh, microbatches=3)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(mlp_block, params, x, mesh, microbatches=0)


def test_aot_v5e_pp_collective_permute():
    """Deviceless AOT vs the real v5e-8 topology: the compiled pipeline
    step carries collective-permute (the stage-to-stage activation hop
    over ICI) and stage-sharded parameters."""
    import re

    pytest.importorskip("jax.experimental.topologies")
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        td = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
    except Exception as e:
        pytest.skip(f"deviceless TPU topology unavailable: {e}")

    mesh = Mesh(np.asarray(td.devices).reshape(2, 4), ("data", "model"))
    params = init_mlp_stack(0, 4, 256, 1024)
    stage_sh = NamedSharding(mesh, P("model"))
    data_sh = NamedSharding(mesh, P("data"))

    def loss(p, h):
        return jnp.mean(
            pipeline_apply(mlp_block, p, h, mesh, microbatches=8) ** 2
        )

    f = jax.jit(jax.grad(loss))
    ab_p = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=stage_sh),
        params,
    )
    ab_x = jax.ShapeDtypeStruct((64, 256), np.float32, sharding=data_sh)
    compiled = f.lower(ab_p, ab_x).compile()
    hlo = compiled.as_text()
    assert "collective-permute" in hlo


def test_pp_nonfinite_at_zero_block():
    """r3 review: drain ticks run block_fn on zero-filled buffers; a block
    non-finite at 0 (here an rsqrt RMS-norm) must not leak NaN into real
    outputs (the masked psum uses jnp.where, not mask*ys — 0*inf = NaN)."""
    mesh = make_mesh(MeshSpec(data=2, model=4))

    def norm_block(params, h):
        # rsqrt(mean(h^2)) is inf at h == 0
        g = h * jax.lax.rsqrt(jnp.mean(h**2, axis=-1, keepdims=True))
        return h + jnp.maximum(g @ params["w1"] + params["b1"], 0.0) @ params["w2"]

    params, x = _setup()
    y_ref = jax.jit(lambda p, h: sequential_apply(norm_block, p, h))(params, x)
    placed = jax.device_put(params, stage_param_sharding(mesh))
    y = jax.jit(
        lambda p, h: pipeline_apply(norm_block, p, h, mesh, microbatches=4)
    )(placed, x)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5,
                               atol=2e-6)


def test_exact_tail_quantum_includes_pp_microbatches():
    """Regression (r4 review): Trainer.validate trims the padded val
    tail to its real rows when 'the layout still divides' — under
    pipeline parallelism the quantum is data_axis * pp_microbatches
    (pipeline_apply rejects batches that don't divide by it), not the
    data axis alone. A real==6 tail on a data=2 / microbatches=2 run
    used to pass the check, trace the trimmed batch, and die in
    pipeline_apply's ValueError at the end of epoch 1."""
    from automoe_tpu.train.loop import TrainConfig, Trainer

    mesh = make_mesh(MeshSpec(data=2, model=4))
    t = object.__new__(Trainer)  # _exact_tail_ok needs only mesh + cfg
    t.mesh = mesh
    t.cfg = TrainConfig(pp_microbatches=2)
    assert not t._exact_tail_ok(6)   # 6 % (2*2) != 0 -> must NOT trim
    assert t._exact_tail_ok(8)
    assert not t._exact_tail_ok(0)
    t.cfg = TrainConfig()            # no PP: the data-axis rule alone
    assert t._exact_tail_ok(6)
    t.mesh = None
    assert t._exact_tail_ok(5)
