"""JIT/compile-cache helpers.

flax's un-jitted `Module.init` eagerly dispatches one XLA call per
parameter initializer — ~2 minutes for the 53M-param AutoMoE on CPU.
Wrapping the whole init in one `jax.jit` is ~6x faster cold and hits the
persistent compilation cache warm.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path

import jax

_DEFAULT_CACHE = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compile_cache(
    cache_dir: str | None = None, *, allow_cpu: bool = False
) -> None:
    """Enable JAX's persistent compilation cache (idempotent, best-effort).

    The cache directory is namespaced by (jax version, platform,
    platform_version, host arch) so a libtpu/runtime upgrade gets a fresh
    cache instead of loading a stale AOT executable the terminal rejects
    with FAILED_PRECONDITION (observed round 1: terminal/client libtpu
    build skew). Off by default on CPU — entries built on a different
    host spew machine-feature mismatch warnings — except when a
    same-machine caller (the test suite) opts in with allow_cpu.

    Note: resolves the backend, so call only after the platform choice is
    settled (never at module import).
    """
    try:
        import jax.extend  # not re-exported by `import jax` on this version

        backend = jax.extend.backend.get_backend()
        if backend.platform == "cpu" and not allow_cpu:
            return
        tag = hashlib.sha256(
            "|".join(
                [
                    jax.__version__,
                    backend.platform,
                    str(backend.platform_version),
                    os.uname().machine,
                ]
            ).encode()
        ).hexdigest()[:16]
        base = Path(
            cache_dir or os.environ.get("AUTOMOE_JAX_CACHE", str(_DEFAULT_CACHE))
        )
        versioned = base / tag
        versioned.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(versioned))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        # A broken cache must never take down the program; recompiling is
        # always a valid fallback.
        pass


def jit_init(model, rng, *args, **kwargs):
    """`model.init` under one jit. Init args are closed over — so any
    device arrays among them are first pulled to host numpy: closed-over
    device arrays in jitted programs are the documented dispatch-poison
    landmine (CLAUDE.md rule 1), and init shapes/values are tiny."""
    import numpy as np

    def to_host(x):
        return np.asarray(x) if isinstance(x, jax.Array) else x

    args = jax.tree.map(to_host, args)
    kwargs = jax.tree.map(to_host, kwargs)
    return jax.jit(lambda k: model.init(k, *args, **kwargs))(rng)
