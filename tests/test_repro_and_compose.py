"""Two production invariants with no reference counterpart to copy:

1. END-TO-END SEED REPRODUCIBILITY — the whole Trainer loop (threaded
   loader with shuffling, jitted steps, BN, checkpoint bookkeeping) is a
   pure function of (seed, config, data): two runs produce bit-identical
   params and loss logs. The reference can't promise this (CUDA conv
   nondeterminism + unseeded DataLoader workers); XLA:TPU/CPU runs are
   deterministic, so the rebuild pins it as a contract — it's what makes
   mid-epoch resume (--save-every-steps) exact rather than approximate.

2. --ema --quantize COMPOSITION — int8 PTQ serving must calibrate the
   EMA weights when both flags are set: from_orbax_checkpoint loads
   variables BEFORE quantization (infer/engine.py docstring), so the
   quantized engine built with prefer_ema=True must equal one built
   directly from the EMA tree, and differ from the raw-weights engine.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.data.loader import DataLoader
from automoe_tpu.train.loop import TrainConfig, Trainer
from automoe_tpu.train.workloads import bdd_expert_workload


class _Seg:
    def __init__(self, n=16, seed=0):
        self.n, self.seed = n, seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.default_rng(self.seed * 1000 + i)
        return {
            "image": r.normal(size=(32, 32, 3)).astype(np.float32),
            "mask": r.integers(0, 3, (32, 32)).astype(np.int32),
        }


def _fit(tmp_path, tag):
    wl = bdd_expert_workload("drivable", image_size=32)
    train = DataLoader(_Seg(16), batch_size=4, num_workers=1, shuffle=True)
    val = DataLoader(_Seg(8, seed=1), batch_size=4, num_workers=1,
                     shuffle=False)
    cfg = TrainConfig(
        epochs=2, learning_rate=1e-2, run_name=tag, seed=7, log_every=1,
        ckpt_root=str(tmp_path / f"c{tag}"),
        runs_root=str(tmp_path / f"r{tag}"),
    )
    tr = Trainer(wl, train, val, cfg)
    tr.fit()
    jsonl = tmp_path / f"r{tag}" / f"bdd_drivable_{tag}" / "metrics.jsonl"
    losses = [
        rec["train/loss"]
        for rec in map(json.loads, jsonl.read_text().splitlines())
        if "train/loss" in rec
    ]
    return tr, losses


def test_trainer_seed_reproducibility(tmp_path):
    tr1, losses1 = _fit(tmp_path, "a")
    tr2, losses2 = _fit(tmp_path, "b")
    assert losses1 == losses2  # bit-identical loss logs, shuffle included
    for x, y in zip(jax.tree.leaves(tr1.state.params),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(tr1.state.batch_stats),
                    jax.tree.leaves(tr2.state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_engine_ema_quantize_composition(tmp_path, rng):
    from automoe_tpu.ckpt.checkpoint import CheckpointManager
    from automoe_tpu.configs import load_model_config
    from automoe_tpu.infer.engine import InferenceEngine
    from automoe_tpu.models import create_automoe_model
    from automoe_tpu.train.state import TrainState
    from automoe_tpu.utils import jit_init

    CFG = {
        "experts": [
            {"type": "drivable", "num_classes": 3},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    HW = (64, 64)
    cfg = load_model_config(CFG)
    model = create_automoe_model(cfg, fast_gating_pool=True)
    init_batch = {
        "image": jnp.zeros((1, *HW, 3), jnp.float32),
        "speed": jnp.zeros((1, 1), jnp.float32),
        "steering": jnp.zeros((1, 1), jnp.float32),
        "throttle": jnp.zeros((1, 1), jnp.float32),
        "brake": jnp.zeros((1, 1), jnp.float32),
    }
    variables = jit_init(model, jax.random.key(0), init_batch)

    # a checkpoint whose EMA weights are DISTINCT from the raw weights
    import optax

    state = TrainState.create(
        params=variables["params"], tx=optax.sgd(1e-3),
        batch_stats=variables.get("batch_stats", {}), ema_decay=0.9,
    )
    state = state.replace(
        ema_params=jax.tree.map(lambda p: p * 0.9, state.ema_params)
    )
    cm = CheckpointManager(str(tmp_path / "ck"), "automoe", "run")
    cm.save_epoch(state, 0, 1.0)
    ckpt = str(tmp_path / "ck" / "automoe" / "run" / "best")

    calib = np.random.default_rng(3).integers(
        0, 256, (2, *HW, 3), dtype=np.uint8
    )
    kw = dict(model_hw=HW, camera_hw=HW, dtype=jnp.float32,
              quantize=True, calib_frames=calib)
    eng_ema = InferenceEngine.from_orbax_checkpoint(
        CFG, ckpt, prefer_ema=True, **kw
    )
    eng_raw = InferenceEngine.from_orbax_checkpoint(CFG, ckpt, **kw)

    ema_vars = {"params": jax.tree.map(lambda p: p * 0.9,
                                       variables["params"]),
                "batch_stats": variables.get("batch_stats", {})}
    eng_direct = InferenceEngine(CFG, variables=ema_vars, **kw)

    frame = np.random.default_rng(4).integers(
        0, 256, (HW[0], HW[1], 3), dtype=np.uint8
    )
    out_ema = eng_ema.infer(frame, 5.0)
    out_raw = eng_raw.infer(frame, 5.0)
    out_direct = eng_direct.infer(frame, 5.0)

    # prefer_ema + quantize == quantize of the EMA tree (calibration ran
    # on the EMA weights, not the raw ones)
    np.testing.assert_array_equal(
        np.asarray(out_ema["waypoints"]), np.asarray(out_direct["waypoints"])
    )
    # and it is genuinely a different model than the raw weights
    assert not np.allclose(
        np.asarray(out_ema["waypoints"]), np.asarray(out_raw["waypoints"])
    )
