"""JIT/compile-cache helpers.

flax's un-jitted `Module.init` eagerly dispatches one XLA call per
parameter initializer — ~2 minutes for the 53M-param AutoMoE on CPU.
Wrapping the whole init in one `jax.jit` is ~6x faster cold and hits the
persistent compilation cache warm.
"""
from __future__ import annotations

import os
from pathlib import Path

import jax

_DEFAULT_CACHE = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    cache_dir = cache_dir or os.environ.get("AUTOMOE_JAX_CACHE", str(_DEFAULT_CACHE))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def jit_init(model, rng, *args, **kwargs):
    """`model.init` under one jit (donates nothing; init args are closed over)."""
    return jax.jit(lambda k: model.init(k, *args, **kwargs))(rng)
