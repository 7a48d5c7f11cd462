"""Feature-COMPOSITION matrix: the training levers working together.

Each lever is pinned on its own (test_bf16, test_remat, test_grad_accum,
test_qat, test_ema, test_tp, test_sp); production runs combine them —
`--bf16 --remat --grad-accum 2 --ema-decay .999` is one command line.
The reference has none of these levers, so there is no torch oracle for
the compositions; the contract here is internal consistency: every combo
must fit end-to-end on the 8-device mesh with finite, decreasing loss
and each lever's own invariant still holding (EMA present + fp32,
optimizer-step accounting under accumulation, bf16 compute with fp32
master params).

Combos that must NOT compose raise loudly instead (grad_accum×scan,
spatial×ep — tested where those levers live).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.data.loader import DataLoader
from automoe_tpu.parallel import MeshSpec, make_mesh
from automoe_tpu.train.loop import TrainConfig, Trainer
from automoe_tpu.train.workloads import bdd_expert_workload

HW = 32


class _Seg:
    def __len__(self):
        return 32  # 4 loader batches of 8 (divisible by the 8-dev mesh)

    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return {
            "image": r.normal(size=(HW, HW, 3)).astype(np.float32),
            "mask": r.integers(0, 3, (HW, HW)).astype(np.int32),
        }


def _fit(tmp_path, *, dtype=jnp.float32, remat=False, qat=False, **cfg_kw):
    wl = bdd_expert_workload(
        "drivable", image_size=HW, dtype=dtype, remat=remat, qat=qat
    )
    train = DataLoader(_Seg(), batch_size=8, num_workers=0, shuffle=False)
    cfg = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="combo", log_every=1,
        ckpt_root=str(tmp_path / "c"), runs_root=str(tmp_path / "r"),
        **cfg_kw,
    )
    tr = Trainer(wl, train, train, cfg,
                 mesh=make_mesh(MeshSpec(data=8, model=1)))
    out = tr.fit()
    assert np.isfinite(out["best_val_loss"]), out
    return tr, out


def test_bf16_remat(tmp_path):
    tr, _ = _fit(tmp_path, dtype=jnp.bfloat16, remat=True)
    for x in jax.tree.leaves(tr.state.params):
        assert x.dtype == jnp.float32  # master weights survive remat


def test_bf16_grad_accum_ema(tmp_path):
    tr, _ = _fit(
        tmp_path, dtype=jnp.bfloat16, grad_accum=2, ema_decay=0.9,
    )
    # 4 loader batches / K=2 -> 2 optimizer steps
    assert int(jax.device_get(tr.state.step)) == 2
    assert tr.state.ema_params is not None
    for x in jax.tree.leaves(tr.state.ema_params):
        assert x.dtype == jnp.float32
    # the EMA moved off the init point but not onto the raw params
    d_raw = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(tr.state.ema_params),
                        jax.tree.leaves(tr.state.params))
    ]
    assert max(d_raw) > 0


def test_bf16_qat(tmp_path):
    """QAT's straight-through fake-quant under bf16 compute: the quant
    grid is computed from bf16 weights cast up — must stay finite and
    trainable."""
    tr, out = _fit(tmp_path, dtype=jnp.bfloat16, qat=True)
    assert np.isfinite(out["best_val_loss"])


def test_remat_grad_accum_ema_scanfree(tmp_path):
    """The memory story end-to-end: remat (activation recompute) +
    grad-accum (microbatching) + EMA (extra param tree) in one fit."""
    tr, _ = _fit(tmp_path, remat=True, grad_accum=2, ema_decay=0.9)
    assert int(jax.device_get(tr.state.step)) == 2
    assert tr.state.ema_params is not None


def test_bf16_scan_steps_ema(tmp_path):
    """scan-steps dispatch (K optimizer steps per jitted call) with bf16
    compute and the fused EMA update."""
    tr, _ = _fit(
        tmp_path, dtype=jnp.bfloat16, steps_per_call=2, ema_decay=0.9,
    )
    assert int(jax.device_get(tr.state.step)) == 4  # all 4 batches step
    assert tr.state.ema_params is not None


def test_bf16_tp(tmp_path):
    """bf16 compute with tensor-parallel kernel sharding over 'model'."""
    wl = bdd_expert_workload("drivable", image_size=HW, dtype=jnp.bfloat16)
    train = DataLoader(_Seg(), batch_size=8, num_workers=0, shuffle=False)
    cfg = TrainConfig(
        epochs=1, learning_rate=1e-3, run_name="tp16", log_every=1,
        tp_min_dim=128,
        ckpt_root=str(tmp_path / "c"), runs_root=str(tmp_path / "r"),
    )
    tr = Trainer(wl, train, train, cfg,
                 mesh=make_mesh(MeshSpec(data=4, model=2)))
    out = tr.fit()
    assert np.isfinite(out["best_val_loss"])
