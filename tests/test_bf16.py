"""bf16 mixed-precision TRAINING fidelity (SURVEY.md §2.2 AMP row).

The reference trains fp32 and autocasts fp16 only at inference
(/root/reference/inference/run_automoe.py:51). On TPU the MXU's native
bf16 rate makes mixed precision the production training regime:
`automoe-train ... --bf16` sets the flax module compute dtype to
bfloat16 while params, optimizer state, and loss reductions stay fp32
(master weights; ops/masked.py upcasts before softmax/reduce). These
tests pin the semantics that make that flag trustworthy:

  * params and optimizer state remain fp32 under bf16 compute, and the
    gradients arrive fp32 (the param->bf16 cast is differentiated);
  * at init the loss matches fp32 closely and the gradient structure is
    sane: near-perfect alignment at the head, bounded rounding noise
    through the deep BN'd backbone (measured ~0.85 cosine at init on
    random data — noise AMPLITUDE, not direction bias: the norm ratio
    stays ~1 and training below converges identically);
  * an SGD run trains to the same solution as fp32 with small param
    drift (SGD per the r2 equivalence lesson: AdamW's rsqrt(v)
    amplifies fp noise on near-zero-gradient leaves, docs/DESIGN.md §3).

Perf evidence lives in benchmarks/BENCHMARKS.md (train_step_bench
--dtype both on the real chip); this file is the numerics side.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.train.workloads import bdd_expert_workload

B, HW = 8, 32


def _fixture(seed):
    """Learnable drivable batch: ONE class per image keyed to the image
    mean. At 32x32 the logits grid is 1x1 (stride-32 backbone) upsampled
    back, so a per-image-constant mask is exactly fittable — loss -> 0."""
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(B, HW, HW, 3)).astype(np.float32)
    cls = np.digitize(img.mean((1, 2, 3)), [-0.05, 0.05]).astype(np.int32)
    mask = np.broadcast_to(cls[:, None, None], (B, HW, HW)).copy()
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask)}


def _workloads():
    wl32 = bdd_expert_workload("drivable", image_size=HW)
    wl16 = bdd_expert_workload("drivable", image_size=HW, dtype=jnp.bfloat16)
    # identical fp32 init for both (param_dtype is fp32 in both modules,
    # so one init tree serves both compute dtypes)
    variables = wl32.init_variables(jax.random.key(0))
    return wl32, wl16, variables


def _flat(tree):
    return np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree.leaves(tree)]
    )


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na * nb > 0 else 1.0


def test_bf16_loss_and_grads_at_init():
    wl32, wl16, variables = _workloads()
    batch = _fixture(0)
    rng = jax.random.key(1)

    def loss_and_grads(wl):
        def f(p):
            loss, _ = wl.loss_fn(
                p, variables.get("batch_stats", {}), batch, rng, True
            )
            return loss
        return jax.jit(jax.value_and_grad(f))(variables["params"])

    l32, g32 = loss_and_grads(wl32)
    l16, g16 = loss_and_grads(wl16)
    # loss reductions are fp32 on both paths; bf16 activations perturb
    # the logits only (measured rel diff ~0.2%)
    assert abs(float(l16) - float(l32)) / float(l32) < 0.02
    # gradients flow through the bf16 cast back to the fp32 master params
    for g in jax.tree.leaves(g16):
        assert g.dtype == jnp.float32
    # head (adjacent to the fp32 loss): near-perfect alignment
    head_cos = _cos(
        _flat(g32["decoder"]["conv1"]["kernel"]),
        _flat(g16["decoder"]["conv1"]["kernel"]),
    )
    assert head_cos > 0.95, head_cos
    # deep backbone convs accumulate bf16 rounding noise through the
    # backward chain (measured ~0.85 at init); it must stay amplitude
    # noise, not a direction or scale bias
    for name in ("conv1", "layer1_0", "layer4_1"):
        sub32, sub16 = g32["backbone"][name], g16["backbone"][name]
        c = _cos(_flat(sub32), _flat(sub16))
        assert c > 0.7, (name, c)
    n32, n16 = np.linalg.norm(_flat(g32)), np.linalg.norm(_flat(g16))
    assert abs(n16 / n32 - 1.0) < 0.1, n16 / n32


def test_bf16_sgd_trains_to_fp32_solution():
    import optax

    wl32, wl16, variables = _workloads()
    batches = [_fixture(s) for s in range(2)]
    rng = jax.random.key(2)

    def run(wl, steps=30):
        tx = optax.sgd(1e-1)

        @jax.jit
        def step(params, stats, opt_state, batch):
            def f(p):
                loss, (_, new_stats) = wl.loss_fn(p, stats, batch, rng, True)
                return loss, new_stats
            (loss, new_stats), grads = jax.value_and_grad(f, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, \
                opt_state, loss

        params = variables["params"]
        stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)
        losses = []
        for i in range(steps):
            params, stats, opt_state, loss = step(
                params, stats, opt_state, batches[i % len(batches)]
            )
            losses.append(float(loss))
        return losses, params

    losses32, p32 = run(wl32)
    losses16, p16 = run(wl16)

    # params stayed fp32 master weights through bf16 training
    for x in jax.tree.leaves(p16):
        assert x.dtype == jnp.float32

    # the first step sees identical params: losses nearly equal
    assert abs(losses16[0] - losses32[0]) / losses32[0] < 0.02

    # both train to the solution (measured ~1e-5 by step 30)
    assert losses32[-1] < 1e-3, losses32
    assert losses16[-1] < 1e-3, losses16

    # endpoint params stay close (measured ~1.7% relative drift)
    a, b = _flat(p32), _flat(p16)
    rel = float(np.linalg.norm(a - b) / np.linalg.norm(a))
    assert rel < 0.05, f"bf16/fp32 param drift {rel}"


def test_bf16_cli_flag_threads_dtype(monkeypatch):
    """`automoe-train bdd --bf16` must reach the workload's compute dtype."""
    from automoe_tpu.train import cli as tcli

    seen = {}

    class FakeTrainer:
        def __init__(self, wl, train, val, cfg, mesh=None):
            seen["dtype"] = wl.model.dtype
            raise SystemExit(0)

    monkeypatch.setattr(tcli, "Trainer", FakeTrainer)
    monkeypatch.setattr(tcli, "_init_backend", lambda args: None)
    monkeypatch.setattr(tcli, "_loaders", lambda *a, **kw: ([], []))
    with pytest.raises(SystemExit):
        tcli.main(["bdd", "--task", "drivable", "--bf16", "--no-mesh"])
    assert seen["dtype"] == jnp.bfloat16
