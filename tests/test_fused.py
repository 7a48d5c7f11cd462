"""Fused grouped-conv trunk ≡ N independent ResNet trunks."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.models.fused_experts import (
    FusedResNet18Trunk,
    fuse_expert_variables,
    split_fused_features,
)
from automoe_tpu.models.resnet import ResNet18Backbone


def test_fused_trunk_matches_independent(rng):
    N = 3
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    single = ResNet18Backbone()
    expert_vars = []
    outs = []
    for i in range(N):
        v = jax.jit(lambda k: single.init(k, img))(jax.random.key(i))
        expert_vars.append(
            {"params": {"backbone": v["params"]},
             "batch_stats": {"backbone": v["batch_stats"]}}
        )
        outs.append(single.apply(v, img))

    fused = FusedResNet18Trunk(groups=N)
    fused_vars = fuse_expert_variables(expert_vars)
    feats = fused.apply(fused_vars, img)
    assert feats.shape == (2, 2, 2, 512 * N)
    parts = split_fused_features(feats, N)
    for i in range(N):
        np.testing.assert_allclose(
            np.asarray(parts[i]), np.asarray(outs[i]), rtol=2e-4, atol=2e-4
        )
