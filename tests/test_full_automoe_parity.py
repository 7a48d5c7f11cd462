"""Capstone parity: the ACTUAL reference AutoMoE (torch) vs ours, with the
full composite state dict transferred through import_automoe.

This is the end-to-end fidelity check BASELINE.md calls for: identical
batch in, waypoints / speed / expert weights / gate logits out, compared
within fp32 conv-stack tolerance.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.torch_mirror import add_reference_to_path, install_torchvision_stub

install_torchvision_stub()
add_reference_to_path()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from automoe_tpu.ckpt import import_automoe  # noqa: E402
from automoe_tpu.ckpt.torch_import import to_numpy_state_dict  # noqa: E402
from automoe_tpu.configs import load_model_config  # noqa: E402
from automoe_tpu.models import create_automoe_model  # noqa: E402

CONFIG = {
    "experts": [
        {"type": "detection", "num_classes": 10, "output_dim": 256,
         "pretrained_backbone": False},
        {"type": "segmentation", "num_classes": 19, "output_dim": 256,
         "pretrained_backbone": False},
        {"type": "drivable", "num_classes": 3, "output_dim": 256,
         "pretrained_backbone": False},
        {"type": "nuscenes", "num_queries": 16, "num_classes": 10,
         "output_dim": 256, "fusion": "sum", "use_lidar": False,
         "use_tnet": False, "bbox_dim": 4},
    ],
    "gating": {"processed_dim": 256, "hidden_dim": 128, "temperature": 1.0,
               "use_softmax": True, "top_k": 2, "noise_type": "gumbel",
               "noise_scale": 0.0, "apply_topk_at_eval": True},
    "context": {"type": "simple", "context_dim": 64},
    "policy": {"hidden_dim": 256, "num_waypoints": 10, "waypoint_dim": 2},
}


@pytest.mark.slow
def test_full_automoe_output_parity(rng):
    from models.automoe import create_automoe_model as ref_create

    torch.manual_seed(11)
    tmodel = ref_create(CONFIG, device="cpu")
    tmodel.eval()

    cfg = load_model_config(CONFIG)
    variables = import_automoe(to_numpy_state_dict(tmodel), cfg)
    model = create_automoe_model(cfg)

    B = 2
    image = rng.normal(size=(B, 64, 64, 3)).astype(np.float32)
    speed = rng.uniform(0, 30, (B, 1)).astype(np.float32)
    steering = rng.uniform(-1, 1, (B, 1)).astype(np.float32)
    throttle = rng.uniform(0, 1, (B, 1)).astype(np.float32)
    brake = np.zeros((B, 1), np.float32)

    jbatch = {
        "image": jnp.asarray(image),
        "speed": jnp.asarray(speed),
        "steering": jnp.asarray(steering),
        "throttle": jnp.asarray(throttle),
        "brake": jnp.asarray(brake),
    }
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, jbatch)

    tbatch = {
        "image": torch.from_numpy(np.transpose(image, (0, 3, 1, 2))),
        "speed": torch.from_numpy(speed),
        "steering": torch.from_numpy(steering),
        "throttle": torch.from_numpy(throttle),
        "brake": torch.from_numpy(brake),
    }
    with torch.no_grad():
        ref = tmodel(tbatch)

    tol = dict(rtol=1e-2, atol=5e-3)  # fp32 conv accumulation noise
    np.testing.assert_allclose(
        np.asarray(out["waypoints"]), ref["waypoints"].numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(out["speed_seq"]), ref["speed_seq"].numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(out["expert_weights"]), ref["expert_weights"].numpy(),
        rtol=2e-2, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["gate_logits"]), ref["gate_logits"].numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(out["context_features"]),
        ref["context_features"].numpy(), rtol=1e-3, atol=1e-4,
    )
