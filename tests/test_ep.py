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
