"""Shared TPU backend-init watchdog for every on-chip bench.

A healthy backend answers jax.devices() in seconds; a wedged axon relay
(e.g. after a mid-compile kill, CLAUDE.md landmine 4) blocks it
indefinitely — measured 4+ hours on 2026-08-18 — and a silently hung
bench is worse than a loud error. The watchdog covers ONLY backend init
(compiles may legitimately take 10+ min and are not bounded here).

One definition instead of a copy per bench: the timeout env var
(BENCH_INIT_TIMEOUT_S), the flush-before-_exit contract, and the error
message stay in sync for everything that greps for them.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Optional


def init_watchdog(payload: Optional[dict] = None, *,
                  timeout_s: float = 180.0, exit_code: int = 17):
    """Arm a timer, then block in jax.devices(); exit loudly if wedged.

    payload: extra keys merged into the error JSON line — callers with a
    driver contract (bench.py must ALWAYS print its metric skeleton) pass
    it here. Returns jax.devices() on success."""
    import jax

    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", timeout_s))
    msg = dict(payload or {})
    msg["error"] = (
        f"TPU backend init exceeded {timeout_s:.0f}s — tunnel wedged; "
        "no measurement taken"
    )
    timer = threading.Timer(timeout_s, lambda: (
        # os._exit skips stdio flush; don't lose the line
        print(json.dumps(msg), flush=True),
        os._exit(exit_code),
    ))
    timer.daemon = True
    timer.start()
    devices = jax.devices()  # blocks here iff the tunnel is dead
    timer.cancel()
    return devices
