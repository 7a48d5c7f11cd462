"""Test env: force an 8-device virtual CPU mesh before jax import.

Multi-device sharding tests run on XLA's host-platform virtual devices
(the reference has no distributed tests at all — SURVEY.md §4; this is the
fake-mesh strategy it lacked).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU: the ambient TPU platform plugin ignores the JAX_PLATFORMS env
# var, so the config knob (pre-backend-init) is the only reliable override.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch fp32; XLA's default matmul precision
# downcasts fp32 matmul inputs (~1e-1 abs error) — use true fp32 in tests.
jax.config.update("jax_default_matmul_precision", "highest")

from automoe_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(allow_cpu=True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
