"""Packed sequence caches: memory-mapped, precomputed windows.

Fixes the reference CarlaSequenceDataset I/O amplification — it re-globs
the run directory and torch.loads H+1 full frames for EVERY sample
(dataloaders/carla_sequence_loader.py:95-104). Packing precomputes each
window's targets once and stores columnar memmapped .npy files; a sample
read is then one sliced memmap access (no decode, no pickle, no glob),
fast enough to keep the TPU fed from a single host thread.

Layout: <out_dir>/{image.npy (float16 [N,H,W,3] NHWC), waypoints.npy,
speed.npy, throttle.npy, steering.npy, brake.npy, context.npy,
index.json}.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

_FIELDS = ("image", "waypoints", "speed", "throttle", "steering", "brake", "context")


def pack_carla_sequences(
    split_dir, out_dir, *, horizon: int = 8, stride: int = 1
) -> int:
    """Convert a reference-format CARLA split into a packed sequence cache."""
    from automoe_tpu.data.datasets import CarlaSequenceDataset

    ds = CarlaSequenceDataset(split_dir, horizon=horizon, stride=stride)
    n = len(ds)
    if n == 0:
        return 0
    first = ds[0]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    has_context = "context" in first
    shapes = {
        "image": (n, *first["image"].shape),
        "waypoints": (n, horizon, 2),
        "speed": (n, horizon),
        "throttle": (n, horizon),
        "steering": (n, horizon),
        "brake": (n, horizon),
    }
    dtypes = {k: np.float32 for k in shapes}
    dtypes["image"] = np.float16
    if has_context:
        shapes["context"] = (n, *first["context"].shape)
        dtypes["context"] = np.float32

    mm = {
        k: np.lib.format.open_memmap(
            out / f"{k}.npy", mode="w+", dtype=dtypes[k], shape=shapes[k]
        )
        for k in shapes
    }
    metas = []
    for i in range(n):
        s = ds[i]
        for k in shapes:
            mm[k][i] = s[k]
        metas.append(s["meta"])
    for m in mm.values():
        m.flush()
    (out / "index.json").write_text(
        json.dumps({"n": n, "horizon": horizon, "meta": metas})
    )
    return n


class PackedSequenceDataset:
    """Drop-in replacement for CarlaSequenceDataset over packed caches."""

    def __init__(self, packed_dir):
        self.dir = Path(packed_dir)
        index = json.loads((self.dir / "index.json").read_text())
        self.n = index["n"]
        self.horizon = index["horizon"]
        self.meta = index["meta"]
        self._mm: Dict[str, Optional[np.ndarray]] = {}
        for k in _FIELDS:
            path = self.dir / f"{k}.npy"
            self._mm[k] = np.load(path, mmap_mode="r") if path.exists() else None

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        out = {
            k: np.asarray(v[i], np.float32)
            for k, v in self._mm.items()
            if v is not None
        }
        out["meta"] = self.meta[i]
        return out

    def read_batch(self, indices) -> Dict[str, np.ndarray]:
        """Whole-batch gather (DataLoader fast path; no 'meta' — metadata
        stays host-side in `self.meta`). The native C++ reader
        (`data.native_packed.NativePackedDataset`) is the faster drop-in."""
        idx = np.asarray(indices, np.int64)
        return {
            k: v[idx].astype(np.float32)
            for k, v in self._mm.items()
            if v is not None
        }


# --- generic per-frame packing (BDD / nuScenes / CARLA frame tasks) -----

#: image fields at least this many elements per row are stored float16
#: (halves the disk + mmap-read volume; normalized pixel data tolerates
#: half precision). All other float fields keep float32 — notably lidar
#: point clouds, where f16 would quantize metric coordinates — and
#: integer fields (labels, masks) are int32.
_F16_MIN_ROW_ELEMS = 4096


def _pack_dtype(name: str, arr: np.ndarray) -> np.dtype:
    if np.issubdtype(arr.dtype, np.integer):
        return np.int32
    if "image" in name and arr.size >= _F16_MIN_ROW_ELEMS:
        return np.float16
    return np.float32


def pack_frames(dataset, out_dir) -> int:
    """Pack ANY fixed-shape frame dataset (samples = dict of arrays, e.g.
    BDDDetectionDataset / BDDSegmentationDataset / NuScenesDataset) into a
    columnar memmap cache: one .npy per field + index.json. Read back with
    `PackedFrameDataset` (python) or `NativePackedDataset` (C++ threaded
    gather). Non-array sample entries (paths, metas) are skipped.

    The reference pipeline decodes images from disk per sample every epoch
    (dataloaders/bdd_detection_loader.py); packing pays that decode once.
    """
    n = len(dataset)
    if n == 0:
        return 0
    first = dataset[0]
    fields = {
        k: v for k, v in first.items()
        if isinstance(v, np.ndarray) and v.dtype != object
    }
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    mm = {
        k: np.lib.format.open_memmap(
            out / f"{k}.npy", mode="w+", dtype=_pack_dtype(k, v),
            shape=(n, *v.shape),
        )
        for k, v in fields.items()
    }
    for i in range(n):
        s = dataset[i] if i else first
        for k in mm:
            mm[k][i] = s[k]
    for m in mm.values():
        m.flush()
    (out / "index.json").write_text(json.dumps({"n": n, "kind": "frames"}))
    return n


class PackedFrameDataset:
    """Reader for `pack_frames` caches: float16 fields widen to float32,
    int32 fields stay int32. Exposes the same `read_batch` fast path the
    DataLoader auto-detects; `NativePackedDataset` is the faster drop-in."""

    def __init__(self, packed_dir):
        self.dir = Path(packed_dir)
        index = json.loads((self.dir / "index.json").read_text())
        self.n = index["n"]
        self._mm = {
            p.stem: np.load(p, mmap_mode="r")
            for p in sorted(self.dir.glob("*.npy"))
        }

    @staticmethod
    def _out_dtype(arr) -> np.dtype:
        return np.int32 if np.issubdtype(arr.dtype, np.integer) else np.float32

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {
            k: np.asarray(v[i], self._out_dtype(v)) for k, v in self._mm.items()
        }

    def read_batch(self, indices) -> Dict[str, np.ndarray]:
        idx = np.asarray(indices, np.int64)
        return {
            k: v[idx].astype(self._out_dtype(v)) for k, v in self._mm.items()
        }
