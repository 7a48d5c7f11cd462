"""FusedAutoMoE (grouped one-trunk serving path) ≡ standard AutoMoE."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.configs import default_model_config
from automoe_tpu.models import create_automoe_model
from automoe_tpu.models.fused_experts import FusedAutoMoE, fuse_automoe_variables
from automoe_tpu.utils import jit_init


@pytest.mark.slow
def test_fused_automoe_matches_standard(rng):
    cfg = default_model_config()
    model = create_automoe_model(cfg)
    B = 2
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 1000, 3), jnp.float32),
        "speed": jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32)),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    variables = jit_init(model, jax.random.key(0), batch)
    ref = model.apply(variables, batch)

    fused = FusedAutoMoE(config=cfg)
    fused_vars = fuse_automoe_variables(variables, cfg)
    out = jax.jit(lambda v, b: fused.apply(v, b))(fused_vars, batch)

    for key in ("waypoints", "speed_seq", "expert_weights", "gate_logits",
                "combined_features", "context_features"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]), rtol=5e-3, atol=2e-4,
            err_msg=key,
        )
    # expert outputs line up too
    np.testing.assert_allclose(
        np.asarray(out["expert_outputs"][0]["class_logits"]),
        np.asarray(ref["expert_outputs"][0]["class_logits"]),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["expert_outputs"][3]["bbox_preds"]),
        np.asarray(ref["expert_outputs"][3]["bbox_preds"]),
        rtol=5e-3, atol=5e-3,
    )


def test_fused_full_context_traces(rng):
    """Review r2: FusedAutoMoE hard-coded the simple-context signature and
    crashed at init for context.type='full'."""
    import jax

    from automoe_tpu.configs import load_model_config
    from automoe_tpu.models.fused_experts import FusedAutoMoE
    from automoe_tpu.utils import jit_init

    cfg = load_model_config({
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "full"},
        "policy": {"num_waypoints": 4},
    })
    model = FusedAutoMoE(cfg, dtype=jnp.float32)
    B = 2
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "speed": jnp.ones((B, 1), jnp.float32),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    v = jit_init(model, jax.random.key(0), batch)
    out = model.apply(v, batch)
    assert np.isfinite(np.asarray(out["waypoints"])).all()
