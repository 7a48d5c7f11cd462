"""ctypes binding for the native C++ LAPJV assignment solver (csrc/
lapjv.cpp), built on demand with g++ and cached next to the source.

Host-exact counterpart of the on-device `hungarian_match`; also exposed as
a `jax.pure_callback` matcher (`hungarian_match_callback`) for parity
verification of the device path.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "lapjv.cpp"
_LIB_DIR = Path(__file__).resolve().parent / "_lib"
_LIB = _LIB_DIR / "liblapjv.so"
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None


def _build() -> None:
    _LIB_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", str(_LIB), str(_SRC), "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib_handle
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.lapjv_solve.restype = ctypes.c_int
        lib.lapjv_solve.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lapjv_solve_batch.restype = ctypes.c_int
        lib.lapjv_solve_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _lib_handle = lib
        return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def lapjv(cost: np.ndarray) -> np.ndarray:
    """cost [n_rows, n_cols] (n_rows <= n_cols) → assigned col per row."""
    lib = load_library()
    cost = np.ascontiguousarray(cost, np.float32)
    n, m = cost.shape
    out = np.full((n,), -1, np.int32)
    rc = lib.lapjv_solve(_fp(cost), n, m, _ip(out))
    if rc != 0:
        raise ValueError(f"lapjv_solve failed (rc={rc}, shape={cost.shape})")
    return out


def lapjv_batch(
    costs: np.ndarray, n_valid: Optional[np.ndarray] = None, n_threads: int = 0
) -> np.ndarray:
    """costs [B, n_rows, n_cols] → [B, n_rows] assigned cols (-1 unused)."""
    lib = load_library()
    costs = np.ascontiguousarray(costs, np.float32)
    B, n, m = costs.shape
    out = np.full((B, n), -1, np.int32)
    nv = (
        np.ascontiguousarray(n_valid, np.int32)
        if n_valid is not None
        else None
    )
    rc = lib.lapjv_solve_batch(
        _fp(costs), B, n, m,
        _ip(nv) if nv is not None else None,
        _ip(out), n_threads,
    )
    if rc != 0:
        raise ValueError(
            f"lapjv_solve_batch failed (rc={rc}: invalid n_valid or "
            "non-finite costs — NaN costs would otherwise hang the "
            "augmenting-path loop)"
        )
    return out


def hungarian_match_callback(
    pred_logits, pred_boxes, tgt_boxes, tgt_labels, **cost_kw
):
    """Drop-in for ops.matching.hungarian_match that routes the assignment
    through the native solver via jax.pure_callback (host round trip —
    verification/debug path, not the TPU hot path)."""
    import jax
    import jax.numpy as jnp

    from automoe_tpu.ops.matching import match_cost_matrix

    cost = jax.vmap(
        lambda l, b, tb, tl: match_cost_matrix(l, b, tb, tl, **cost_kw)
    )(pred_logits, pred_boxes, tgt_boxes, tgt_labels)  # [B, Q, N]
    n_valid = jnp.sum(tgt_labels >= 0, axis=1).astype(jnp.int32)

    B, Q, N = cost.shape

    def host_solve(cost_np, n_valid_np):
        # solve over [N, Q] (targets as rows) so each target gets a query
        costs_t = np.ascontiguousarray(
            np.transpose(np.asarray(cost_np, np.float32), (0, 2, 1))
        )
        return lapjv_batch(costs_t, np.asarray(n_valid_np, np.int32))

    query_idx = jax.pure_callback(
        host_solve,
        jax.ShapeDtypeStruct((B, N), jnp.int32),
        cost,
        n_valid,
        vmap_method="sequential",
    )
    return jnp.maximum(query_idx, 0), tgt_labels >= 0
