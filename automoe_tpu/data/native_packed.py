"""Native (C++) batch reader for packed sequence caches.

Binds csrc/packed_reader.cpp via ctypes (built on demand with g++, cached
in `_lib/`). `NativePackedDataset` is a drop-in for
`data.packed.PackedSequenceDataset` that adds a `read_batch(indices)`
fast path: one multi-threaded mmap gather + f16→f32 convert per field in
native code, instead of B Python-level fancy-index copies. The DataLoader
uses `read_batch` automatically when a dataset exposes it.

Reference counterpart being superseded: the torch DataLoader worker
processes feeding CarlaSequenceDataset (reference
dataloaders/carla_sequence_loader.py:95-104 + torch multiprocessing).
"""
from __future__ import annotations

import ctypes
import json
import subprocess
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "packed_reader.cpp"
_LIB_DIR = Path(__file__).resolve().parent / "_lib"
_LIB = _LIB_DIR / "libpacked_reader.so"
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None

_DTYPES = {0: np.float32, 1: np.float16, 2: np.int32}
# what read_batch materializes per stored dtype (f16 widens to f32)
_OUT_DTYPES = {0: np.float32, 1: np.float32, 2: np.int32}


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
        lib.pr_open.restype = ctypes.c_void_p
        lib.pr_open.argtypes = [ctypes.c_char_p]
        lib.pr_num_fields.restype = ctypes.c_int
        lib.pr_num_fields.argtypes = [ctypes.c_void_p]
        lib.pr_field_name.restype = ctypes.c_char_p
        lib.pr_field_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pr_field_rank.restype = ctypes.c_int
        lib.pr_field_rank.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pr_field_shape.restype = None
        lib.pr_field_shape.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pr_field_dtype.restype = ctypes.c_int
        lib.pr_field_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.pr_num_samples.restype = ctypes.c_int64
        lib.pr_num_samples.argtypes = [ctypes.c_void_p]
        lib.pr_read_batch.restype = ctypes.c_int
        lib.pr_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.pr_close.restype = None
        lib.pr_close.argtypes = [ctypes.c_void_p]
        _lib_handle = lib
        return lib


class NativePackedDataset:
    """Packed-cache dataset backed by the C++ reader.

    Same per-sample interface as PackedSequenceDataset, plus
    `read_batch(indices) -> dict of [B, ...] float32 arrays` (no 'meta' —
    metadata stays host-side in `self.meta` keyed by sample index).
    """

    def __init__(self, packed_dir, *, num_threads: int = 0):
        self.dir = Path(packed_dir)
        self.num_threads = num_threads
        lib = load_library()
        handle = lib.pr_open(str(self.dir).encode())
        if not handle:
            raise FileNotFoundError(
                f"no readable packed cache at {self.dir}"
            )
        self._lib = lib
        self._handle = handle
        index_path = self.dir / "index.json"
        index = json.loads(index_path.read_text()) if index_path.exists() else {}
        self.meta = index.get("meta", [])
        self.horizon = index.get("horizon")
        self.n = int(lib.pr_num_samples(handle))
        self.fields: Dict[str, int] = {}
        self.row_shapes: Dict[str, tuple] = {}
        self.out_dtypes: Dict[str, np.dtype] = {}
        for f in range(lib.pr_num_fields(handle)):
            name = lib.pr_field_name(handle, f).decode()
            rank = lib.pr_field_rank(handle, f)
            shape = (ctypes.c_int64 * max(rank, 1))()
            lib.pr_field_shape(handle, f, shape)
            self.fields[name] = f
            self.row_shapes[name] = tuple(shape[i] for i in range(rank))
            self.out_dtypes[name] = _OUT_DTYPES[lib.pr_field_dtype(handle, f)]

    def __len__(self) -> int:
        return self.n

    def read_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        idx = np.ascontiguousarray(indices, np.int64)
        b = len(idx)
        idx_p = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        out: Dict[str, np.ndarray] = {}
        for name, f in self.fields.items():
            buf = np.empty((b, *self.row_shapes[name]), self.out_dtypes[name])
            rc = self._lib.pr_read_batch(
                self._handle, f, idx_p, b,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.num_threads,
            )
            if rc != 0:
                raise ValueError(
                    f"pr_read_batch failed (rc={rc}, field={name}, "
                    f"n={self.n}, batch={b})"
                )
            out[name] = buf
        return out

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        batch = self.read_batch([i])
        out = {k: v[0] for k, v in batch.items()}
        if self.meta:
            out["meta"] = self.meta[i]
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.pr_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def native_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False
