"""QAT (quantization-aware training) — ops/fake_quant.py + the models'
`qat` flag + CLI --qat.

The claim chain pinned here:
 (1) the STE ops land values on the int8 grid and pass gradients
     through as identity;
 (2) the per-output-channel weight grid is EXACTLY the PTQ grid
     (serving/quant.py::quantize_folded), and it commutes with
     per-channel scaling — i.e. with BN folding — so the quantization
     the network trains against IS its deployed folded-weight
     quantization;
 (3) the qat flag preserves the param tree (checkpoints/torchvision
     import/PTQ export unaffected);
 (4) measured on a real expert: the QAT forward sits strictly closer
     to the deployed int8 forward than the float forward does (the
     residual is activation-scale detail, not weight grid — see the
     test body for the honest decomposition);
 (5) a QAT workload actually trains (loss decreases under SGD);
 (6) the CLI routes --qat to the workload factory.
No reference counterpart (the reference has no quantization at all;
its serving story is fp16 autocast, inference/run_automoe.py:51).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.ops.fake_quant import fake_quant_act, fake_quant_weight


def test_ste_values_and_grads():
    w = np.asarray([[1.0, -2.0], [0.5, 127.0]], np.float32)  # last dim = out
    out = np.asarray(fake_quant_weight(jnp.asarray(w)))
    # per-column scale: col0 absmax 1.0 -> s=1/127; col1 absmax 127 -> s=1
    np.testing.assert_allclose(out[:, 1], [-2.0, 127.0])
    np.testing.assert_allclose(out[:, 0], np.round(w[:, 0] * 127) / 127)

    g = jax.grad(lambda t: jnp.sum(fake_quant_weight(t) * 3.0))(
        jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(w))

    x = np.linspace(-1, 1, 64).astype(np.float32)
    xq = np.asarray(fake_quant_act(jnp.asarray(x)))
    s = 1.0 / 127.0  # absmax 1.0
    np.testing.assert_allclose(xq, np.round(x / s) * s, atol=1e-7)
    ga = jax.grad(lambda t: jnp.sum(fake_quant_act(t)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ga), np.ones_like(x))


def test_weight_grid_matches_ptq():
    """fake_quant_weight must reproduce quantize_folded's dequantized
    values exactly: same scale, same round, same clip."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1
    amax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12)
    sw = (amax / 127.0).astype(np.float32)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    np.testing.assert_allclose(
        np.asarray(fake_quant_weight(jnp.asarray(w))),
        wq.astype(np.float32) * sw,
        rtol=0, atol=1e-7,
    )


def test_bn_fold_commutation():
    """fq(c ⊙ W) == c ⊙ fq(W) for per-output-channel c (any sign) —
    the reason training-time fake-quant matches the deployed grid of
    the BN-FOLDED weights (ops/fake_quant.py docstring)."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    c = rng.normal(size=(8,)).astype(np.float32) * 2.0  # mixed signs
    c[np.abs(c) < 0.1] = 0.5
    a = np.asarray(fake_quant_weight(jnp.asarray(w * c)))
    b = np.asarray(fake_quant_weight(jnp.asarray(w))) * c
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_param_tree_identical():
    from automoe_tpu.models.experts import BDDDrivableExpert

    x = jnp.zeros((1, 32, 32, 3))
    va = jax.eval_shape(
        lambda k: BDDDrivableExpert().init(k, x), jax.random.key(0)
    )
    vb = jax.eval_shape(
        lambda k: BDDDrivableExpert(qat=True).init(k, x), jax.random.key(0)
    )
    pa = [(p, s.shape, s.dtype) for p, s in
          jax.tree_util.tree_leaves_with_path(va)]
    pb = [(p, s.shape, s.dtype) for p, s in
          jax.tree_util.tree_leaves_with_path(vb)]
    assert pa == pb


def test_qat_forward_predicts_int8_deploy():
    """The payoff, measured: on the SAME weights, the QAT (fake-quant)
    forward must be a much better approximation of the deployed int8
    forward than the plain float forward is — that's what makes
    training against it optimize the deployed function."""
    from automoe_tpu.models.experts import BDDDrivableExpert
    from automoe_tpu.serving.quant import (
        make_expert_quant_apply,
        quantize_expert,
    )

    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    variables = BDDDrivableExpert().init(jax.random.key(0), x[:1])
    variables = jax.device_get(variables)

    qpack, scales = quantize_expert(
        variables, [x], dtype=jnp.float32
    )
    int8_fwd = make_expert_quant_apply(
        "drivable", 3, scales, dtype=jnp.float32
    )
    y_int8 = np.asarray(
        int8_fwd({"q": qpack, "params": variables["params"]}, jnp.asarray(x))
    )

    y_float = np.asarray(
        BDDDrivableExpert().apply(variables, x, train=False)
    )
    y_qat = np.asarray(
        BDDDrivableExpert(qat=True).apply(variables, x, train=False)
    )

    err_float = float(np.mean((y_float - y_int8) ** 2))
    err_qat = float(np.mean((y_qat - y_int8) ** 2))
    # the QAT forward shares the deployed int8 WEIGHT grid exactly
    # (commutation test above), so its residual vs the deployed forward
    # is activation-side only: dynamic per-batch scales vs the PTQ
    # path's calibrated statics re-randomize each round() boundary,
    # which is the same order as quantization noise itself — measured
    # ~25% lower MSE here, not the 2× a weight-only argument would
    # suggest. The float forward additionally carries the full
    # weight-quantization error, so QAT must sit strictly closer.
    assert err_qat < 0.9 * err_float, (err_qat, err_float)


def test_qat_workload_trains():
    from automoe_tpu.train import TrainState, make_optimizer, make_train_step
    from automoe_tpu.train.workloads import bdd_expert_workload

    wl = bdd_expert_workload("drivable", image_size=32, qat=True)
    variables = wl.init_variables(jax.random.key(0))
    tx = make_optimizer(
        learning_rate=3e-2, weight_decay=0.0, total_steps=8, optimizer="sgd"
    )
    state = TrainState.create(
        params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )
    r = np.random.default_rng(0)
    batch = {
        "image": r.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "mask": r.integers(0, 3, (8, 32, 32)).astype(np.int32),
    }
    step = make_train_step(wl.loss_fn)
    losses = []
    for _ in range(8):
        state, m = step(state, batch, jax.random.key(1))
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_cli_qat_flag(monkeypatch):
    from automoe_tpu.train import cli as tcli

    seen = {}

    def fake_workload(*a, **kw):
        seen.update(kw)
        raise SystemExit(0)

    monkeypatch.setattr(tcli.W, "bdd_expert_workload", fake_workload)
    monkeypatch.setattr(tcli, "_init_backend", lambda args: None)
    with pytest.raises(SystemExit):
        tcli.main(["bdd", "--task", "drivable", "--qat", "--no-mesh"])
    assert seen.get("qat") is True
