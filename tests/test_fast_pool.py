"""fast_gating_pool serving path ≡ default path (same params)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automoe_tpu.configs import default_model_config
from automoe_tpu.models import create_automoe_model
from automoe_tpu.ops.resize import mean_of_resize_weights, resize_bilinear
from automoe_tpu.utils import jit_init


def test_mean_of_resize_weights_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 19)).astype(np.float32))
    up = resize_bilinear(x, 256, 256, antialias=False)
    ref = jnp.mean(up, axis=(1, 2))
    u, v = mean_of_resize_weights(8, 8, 256, 256, False)
    fast = jnp.einsum("h,bhwc,w->bc", jnp.asarray(u), x, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_resize_contraction_orders_equal(rng):
    """resize_bilinear picks its einsum order by intermediate size (HBM-
    bound at camera shapes); both orders must agree, and match
    jax.image.resize numerics."""
    x = jnp.asarray(rng.normal(size=(2, 60, 80, 3)).astype(np.float32))
    # 60x80 -> 32x32 picks W-first (oh*W=2560 > H*ow=1920); 80x60 input
    # with the same output picks H-first — exercise both.
    for shape in ((2, 60, 80, 3), (2, 80, 60, 3)):
        xi = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        out = resize_bilinear(xi, 32, 32, antialias=True)
        ref = jax.image.resize(xi, (shape[0], 32, 32, 3), "bilinear",
                               antialias=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
    # upsample path (expert decoders) unchanged
    up = resize_bilinear(x[:, :8, :8, :], 64, 64, antialias=False)
    ref = jax.image.resize(x[:, :8, :8, :], (2, 64, 64, 3), "bilinear")
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_fast_gating_pool_equivalence(rng):
    cfg = default_model_config()
    m0 = create_automoe_model(cfg)
    m1 = create_automoe_model(cfg, fast_gating_pool=True)
    B = 2
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 100, 3), jnp.float32),
        "speed": jnp.ones((B, 1), jnp.float32),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    v = jit_init(m0, jax.random.key(0), batch)
    o0 = m0.apply(v, batch)
    o1 = m1.apply(v, batch)  # identical params
    for k in ("waypoints", "speed_seq", "expert_weights", "gate_logits",
              "combined_features"):
        np.testing.assert_allclose(
            np.asarray(o0[k]), np.asarray(o1[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
    # fast path returns LOW-RES seg maps
    assert o1["expert_outputs"][1].shape == (B, 2, 2, 19)
    assert o0["expert_outputs"][1].shape == (B, 64, 64, 19)


def test_fast_gating_pool_non_multiple_of_32(rng):
    """Review r2: the fast pool derived low-res dims from image//32, which
    crashed (or silently 2x-scaled the gating features via einsum
    broadcasting) for non-multiple-of-32 inputs — 40x64 reproduced the
    silent case. Dims now come from the expert's actual output."""
    cfg = default_model_config()
    m0 = create_automoe_model(cfg)
    m1 = create_automoe_model(cfg, fast_gating_pool=True)
    B = 2
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 40, 64, 3)).astype(np.float32)),
        "lidar": jnp.zeros((B, 100, 3), jnp.float32),
        "speed": jnp.ones((B, 1), jnp.float32),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    v = jit_init(m0, jax.random.key(0), batch)
    o0 = m0.apply(v, batch)
    o1 = m1.apply(v, batch)
    for k in ("expert_weights", "gate_logits", "waypoints"):
        np.testing.assert_allclose(
            np.asarray(o0[k]), np.asarray(o1[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
