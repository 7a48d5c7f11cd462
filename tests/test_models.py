"""Shape/invariant unit tests — port of the reference's
tests/test_gating_network.py (its only test file) plus extras.

Random weights, random inputs: output schemas, simplex invariants,
freeze-mask semantics, noisy top-k routing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.configs import default_model_config
from automoe_tpu.models import GatingNetwork, SimpleContextExtractor, create_automoe_model
from automoe_tpu.models.automoe import expert_param_mask
from automoe_tpu.models.gating import ContextEncoder, ExpertOutputProcessor
from automoe_tpu.utils import jit_init

B = 2


def test_context_encoder_shapes(rng):
    m = ContextEncoder(hidden_dim=128)
    v = m.init(jax.random.key(0), jnp.zeros((B, 64)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32)))
    assert out.shape == (B, 128)
    assert bool(jnp.isfinite(out).all())


def test_expert_output_processor_shapes(rng):
    m = ExpertOutputProcessor(processed_dim=256)
    v = m.init(jax.random.key(0), jnp.zeros((B, 256)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)))
    assert out.shape == (B, 256)
    assert bool(jnp.isfinite(out).all())


def test_gating_network_invariants(rng):
    m = GatingNetwork(num_experts=4)
    feats = [jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)) for _ in range(4)]
    ctx = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
    v = m.init(jax.random.key(0), feats, ctx)
    out = m.apply(v, feats, ctx)
    assert out["combined_output"].shape == (B, 256)
    assert out["expert_weights"].shape == (B, 4)
    # weights form a simplex (reference test_gating_network.py:51-80)
    np.testing.assert_allclose(
        np.asarray(out["expert_weights"]).sum(-1), 1.0, atol=1e-6
    )
    assert bool((out["expert_weights"] >= 0).all())


def test_gating_topk_masks_weights(rng):
    m = GatingNetwork(num_experts=4, top_k=2, noise_scale=0.0, apply_topk_at_eval=True)
    feats = [jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)) for _ in range(4)]
    ctx = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
    v = m.init(jax.random.key(0), feats, ctx)
    out = m.apply(v, feats, ctx)
    w = np.asarray(out["expert_weights"])
    assert ((w > 0).sum(-1) <= 2).all()
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)


def test_gating_gumbel_noise_rng(rng):
    m = GatingNetwork(num_experts=4, top_k=2, noise_scale=1.0, noise_type="gumbel")
    feats = [jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)) for _ in range(4)]
    ctx = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
    v = m.init({"params": jax.random.key(0), "gating": jax.random.key(1)}, feats, ctx)
    out1 = m.apply(v, feats, ctx, train=True, rngs={"gating": jax.random.key(7)})
    out2 = m.apply(v, feats, ctx, train=True, rngs={"gating": jax.random.key(8)})
    # noise changes routing; logits (pre-noise) are unchanged
    np.testing.assert_allclose(
        np.asarray(out1["gate_logits"]), np.asarray(out2["gate_logits"])
    )
    assert not np.allclose(
        np.asarray(out1["expert_weights"]), np.asarray(out2["expert_weights"])
    )


def test_simple_context_extractor(rng):
    m = SimpleContextExtractor(context_dim=64)
    args = [jnp.asarray(rng.normal(size=(B, 1)).astype(np.float32)) for _ in range(4)]
    v = m.init(jax.random.key(0), *args)
    out = m.apply(v, *args)
    assert out.shape == (B, 64)


@pytest.fixture(scope="module")
def automoe_and_vars():
    model = create_automoe_model(default_model_config())
    batch = _synthetic_batch()
    variables = jit_init(model, jax.random.key(0), batch)
    return model, variables, batch


def _synthetic_batch():
    k = jax.random.key(42)
    ks = jax.random.split(k, 6)
    return {
        "image": jax.random.normal(ks[0], (B, 64, 64, 3)),
        "lidar": jax.random.normal(ks[1], (B, 100, 3)),
        "speed": jax.random.uniform(ks[2], (B, 1)),
        "steering": jax.random.uniform(ks[3], (B, 1)),
        "throttle": jax.random.uniform(ks[4], (B, 1)),
        "brake": jax.random.uniform(ks[5], (B, 1)),
    }


def test_automoe_forward_schema(automoe_and_vars):
    """Full AutoMoE forward schema (reference test_gating_network.py:158-213)."""
    model, variables, batch = automoe_and_vars
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, batch)
    assert out["waypoints"].shape == (B, 10, 2)
    assert out["speed"].shape == (B, 1)
    assert out["speed_seq"].shape == (B, 10)
    assert out["expert_weights"].shape == (B, 4)
    assert out["context_features"].shape == (B, 64)
    assert out["combined_features"].shape == (B, 256)
    assert out["gate_logits"].shape == (B, 4)
    np.testing.assert_allclose(
        np.asarray(out["expert_weights"]).sum(-1), 1.0, atol=1e-6
    )
    assert len(out["expert_outputs"]) == 4
    det = out["expert_outputs"][0]
    assert det["class_logits"].shape == (B, 2, 2, 10)
    assert out["expert_outputs"][1].shape == (B, 64, 64, 19)
    assert out["expert_outputs"][2].shape == (B, 64, 64, 3)
    assert out["expert_outputs"][3]["class_logits"].shape == (B, 196, 10)


def test_automoe_seq_context_slicing(automoe_and_vars):
    """[B,T] vehicle-state sequences are sliced to their last step
    (reference automoe.py:108-134)."""
    model, variables, batch = automoe_and_vars
    seq_batch = dict(batch)
    for k in ("speed", "steering", "throttle", "brake"):
        seq_batch[k] = jnp.tile(batch[k], (1, 5)).at[:, :4].set(99.0)
    out_seq = model.apply(variables, seq_batch)
    out_ref = model.apply(variables, batch)
    np.testing.assert_allclose(
        np.asarray(out_seq["context_features"]),
        np.asarray(out_ref["context_features"]),
        rtol=1e-5, atol=1e-5,
    )


def test_expert_freeze_mask(automoe_and_vars):
    """Freeze semantics: mask marks expert_* subtrees non-trainable
    (reference test_gating_network.py:215-244 / automoe.py:269-279)."""
    _, variables, _ = automoe_and_vars
    import flax

    mask = expert_param_mask(variables["params"], frozen=True)
    flat = flax.traverse_util.flatten_dict(mask)
    expert_keys = [k for k in flat if k[0].startswith("expert_") and not k[0].startswith("extractor")]
    other_keys = [k for k in flat if not k[0].startswith("expert_")]
    assert expert_keys and other_keys
    assert not any(flat[k] for k in expert_keys)
    assert all(flat[k] for k in other_keys)

    mask_all = expert_param_mask(variables["params"], frozen=False)
    assert all(flax.traverse_util.flatten_dict(mask_all).values())


def test_automoe_missing_lidar_defaults(automoe_and_vars):
    """lidar omitted → zero cloud [B,1000,3] (reference automoe.py:173)."""
    model, variables, batch = automoe_and_vars
    b2 = {k: v for k, v in batch.items() if k != "lidar"}
    out = model.apply(variables, b2)
    assert out["waypoints"].shape == (B, 10, 2)


def test_automoe_context_only_weights(automoe_and_vars):
    """Analysis path: weights from context with zero dummy expert features
    (reference AutoMoE.get_expert_weights, automoe.py:235-238)."""
    from automoe_tpu.models.automoe import automoe_context_weights

    model, variables, batch = automoe_and_vars
    w = automoe_context_weights(model, variables, batch)
    assert w.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)


def test_automoe_context_only_weights_full_context():
    """automoe_context_weights must also work with the 'full' context
    extractor (crashed in r1 — ADVICE)."""
    from automoe_tpu.models.automoe import automoe_context_weights

    cfg = default_model_config()
    cfg = dict(cfg) if isinstance(cfg, dict) else cfg
    # rebuild with the full context extractor
    from automoe_tpu.configs import load_model_config

    tree = load_model_config(cfg)
    import dataclasses

    tree = dataclasses.replace(
        tree, context=dataclasses.replace(tree.context, type="full")
    )
    model = create_automoe_model(tree)
    batch = _synthetic_batch()
    variables = jit_init(model, jax.random.key(0), batch)
    w = automoe_context_weights(model, variables, batch)
    assert w.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)


def test_moe_architecture_wrapper(rng):
    """Generic wrapper parity (reference gating_network.py:209-247)."""
    import flax.linen as nn

    from automoe_tpu.models.gating import MoEArchitecture

    class TinyExpert(nn.Module):
        @nn.compact
        def __call__(self, inputs):
            return nn.Dense(256)(inputs["x"])

    moe = MoEArchitecture(
        experts=[TinyExpert(), TinyExpert(), TinyExpert()],
        gating_network=GatingNetwork(num_experts=3),
        policy_head=nn.Dense(8),
    )
    x = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
    v = moe.init(jax.random.key(0), {"x": x}, ctx)
    out = moe.apply(v, {"x": x}, ctx)
    assert out["policy_output"].shape == (B, 8)
    np.testing.assert_allclose(
        np.asarray(out["expert_weights"]).sum(-1), 1.0, atol=1e-6
    )
    assert len(out["expert_outputs"]) == 3


def test_context_only_weights_noisy_topk_config(rng):
    """Review r2: top_k>0 + noise + apply_topk_at_eval used to raise
    InvalidRngError on the analysis path; without an rng it now falls
    back to noise-free routing, and WITH rngs it samples like the
    reference's get_expert_weights."""
    from automoe_tpu.models.gating import GatingNetwork

    g = GatingNetwork(num_experts=3, context_dim=8,
                      expert_output_dims=[4, 4, 4], top_k=2,
                      noise_scale=1.0, apply_topk_at_eval=True)
    ctx = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    vs = g.init({"params": jax.random.key(0), "gating": jax.random.key(1)},
                None, ctx)
    # no rngs: deterministic fallback, no crash, top-k still applies
    w = g.apply(vs, ctx, method="context_only_weights")
    assert np.allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(w) > 1e-6).sum(-1).max() <= 2  # top-2 mask active
    # with rngs: noisy routing (different keys -> different weights)
    w1 = g.apply(vs, ctx, method="context_only_weights",
                 rngs={"gating": jax.random.key(2)})
    w2 = g.apply(vs, ctx, method="context_only_weights",
                 rngs={"gating": jax.random.key(3)})
    assert not np.allclose(np.asarray(w1), np.asarray(w2))
