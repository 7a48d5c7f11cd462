"""Dataset families over preprocessed caches, returning numpy NHWC samples.

Compat layer over the reference's per-sample torch `.pt` caches (schemas at
dataloaders/bdd_*_loader.py, nuscenes_loader.py, carla_*_loader.py) plus a
packed fast path (automoe_tpu.data.packed). Behavioral parity notes:

  * BDD images are decoded from the original files and scaled to [0,1]
    (bdd_detection_loader.py:58); CARLA/nuScenes caches store tensors.
  * Drivable masks take channel 0 of multi-channel masks
    (bdd_drivable_loader.py:22-26); CARLA raw-ID masks remap to
    {0 bg, 1 drivable, 2 alternative} with env-overridable ID sets
    (carla_drivable_loader.py:11-36).
  * nuScenes GT converts devkit Box-likes to [cx,cy,cz,w,l,h,yaw] + 10-way
    labels with name canonicalization (nuscenes_loader.py:56-143).
  * CARLA sequence windows build ego-frame waypoints by rotating future
    world-XY by -yaw, plus speed/throttle/steer/brake profiles and an 8-d
    weather+traffic context (carla_sequence_loader.py:95-168). Unlike the
    reference — which re-globs the run directory and torch.loads H+1 full
    frames per sample (:95-104) — runs are indexed once and frame loads are
    cached per worker.
"""
from __future__ import annotations

import math
import os
from functools import lru_cache
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from automoe_tpu.data.collate import pad_boxes, pad_points
from automoe_tpu.data.ego import world_to_ego_xy

NUSCENES_CLASSES = {
    "car": 0, "truck": 1, "bus": 2, "trailer": 3, "construction_vehicle": 4,
    "pedestrian": 5, "motorcycle": 6, "bicycle": 7, "traffic_cone": 8,
    "barrier": 9,
}


def _load_pt(path) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _image_hwc(x) -> np.ndarray:
    """torch [3,H,W] or numpy [H,W,3] → float32 [H,W,3]."""
    arr = _to_np(x).astype(np.float32)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.transpose(arr, (1, 2, 0))
    return arr


def _read_image_file(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def _read_mask_file(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.int32)


def _list_pt(dirpath: Path, recursive: bool = False) -> List[Path]:
    return sorted(dirpath.rglob("*.pt") if recursive else dirpath.glob("*.pt"))


class BDDDetectionDataset:
    """Per-image {image_path, bboxes xyxy, labels} caches + static box cap."""

    def __init__(self, split_dir, box_cap: int = 48):
        self.files = _list_pt(Path(split_dir))
        if not self.files:
            raise FileNotFoundError(f"no .pt caches under {split_dir}")
        self.box_cap = box_cap

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = _load_pt(self.files[idx])
        image = _read_image_file(s["image_path"])
        boxes, labels = pad_boxes(
            _to_np(s["bboxes"]).astype(np.float32).reshape(-1, 4),
            _to_np(s["labels"]).astype(np.int32).reshape(-1),
            self.box_cap,
        )
        return {"image": image, "bboxes": boxes, "labels": labels}


class BDDSegmentationDataset:
    """{image_path, mask_path} caches; paths resolve against a raw root
    (bdd_segmentation_loader.py:24-39)."""

    def __init__(self, split_dir, raw_root: Optional[str] = None):
        self.files = _list_pt(Path(split_dir))
        if not self.files:
            raise FileNotFoundError(f"no .pt caches under {split_dir}")
        self.raw_root = raw_root or os.environ.get("BDD100K_RAW_ROOT")

    def __len__(self):
        return len(self.files)

    def _resolve(self, p: str) -> str:
        if Path(p).exists():
            return p
        if self.raw_root:
            cand = Path(self.raw_root) / p
            if cand.exists():
                return str(cand)
            if "images" in p:
                # lstrip the separator: joining an absolute component onto
                # a Path DISCARDS raw_root (the reference
                # bdd_segmentation_loader.py:34-37 has this bug — its
                # fallback can never resolve; fixed here, see DESIGN.md §3)
                suffix = p.split("images", 1)[1].lstrip(os.sep)
                cand2 = Path(self.raw_root) / "images" / suffix
                if cand2.exists():
                    return str(cand2)
        return p

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = _load_pt(self.files[idx])
        return {
            "image": _read_image_file(self._resolve(s["image_path"])),
            "mask": _read_mask_file(self._resolve(s["mask_path"])),
        }


class BDDDrivableDataset(BDDSegmentationDataset):
    pass  # channel-0 selection happens in _read_mask_file


def _normalize_mask(mask) -> np.ndarray:
    arr = _to_np(mask)
    if arr.ndim == 3:
        if arr.shape[-1] in (3, 4):
            arr = arr[..., 0]
        elif arr.shape[0] in (3, 4):
            arr = arr[0]
        else:
            arr = np.squeeze(arr)
    return arr.astype(np.int32)


class CarlaFrameDataset:
    """Base over per-frame CARLA caches (recursive run_*/*.pt glob,
    carla_detection_loader.py:10-36)."""

    def __init__(self, split_dir):
        self.files = _list_pt(Path(split_dir), recursive=True)
        if not self.files:
            raise FileNotFoundError(f"no .pt caches under {split_dir}")

    def __len__(self):
        return len(self.files)


class CarlaDetectionDataset(CarlaFrameDataset):
    def __init__(self, split_dir, box_cap: int = 48):
        super().__init__(split_dir)
        self.box_cap = box_cap

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = _load_pt(self.files[idx])
        raw_b = s.get("bboxes")
        raw_l = s.get("labels")
        b = _to_np(raw_b).astype(np.float32).reshape(-1, 4) if raw_b is not None else np.zeros((0, 4), np.float32)
        l = _to_np(raw_l).astype(np.int32).reshape(-1) if raw_l is not None else np.zeros((0,), np.int32)
        boxes, labels = pad_boxes(b, l, self.box_cap)
        return {"image": _image_hwc(s["image"]), "bboxes": boxes, "labels": labels}


class CarlaSegmentationDataset(CarlaFrameDataset):
    """CARLA seg caches hold RAW simulator semantic IDs (the reference
    preprocess stores them unremapped, scripts/preprocess_carla.py:80-89),
    so IDs outside [0, num_classes) are expected — the reference trainer
    sanitizes them to ignore-255 at loss time
    (train_carla_bdd_experts_ddp.py:132-138). We sanitize at load time:
    an out-of-range label reaching masked_cross_entropy would be CLAMPED
    by XLA's take_along_axis into a silently wrong gradient, not ignored.
    """

    def __init__(self, split_dir, num_classes: int = 19):
        super().__init__(split_dir)
        self.num_classes = int(num_classes)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = _load_pt(self.files[idx])
        image = _image_hwc(s["image"])
        mask = s.get("mask")
        if mask is None:
            mask = np.full(image.shape[:2], 255, np.int32)
        else:
            mask = _normalize_mask(mask)
            invalid = (mask < 0) | (
                (mask >= self.num_classes) & (mask != 255)
            )
            if invalid.any():
                mask = np.where(invalid, 255, mask).astype(np.int32)
        return {"image": image, "mask": mask}


def _parse_ids_env(key: str) -> Optional[List[int]]:
    val = os.environ.get(key)
    if not val:
        return None
    try:
        return [int(x) for x in val.split(",") if x.strip()]
    except ValueError:
        return None


class CarlaDrivableDataset(CarlaFrameDataset):
    def __init__(self, split_dir, drivable_ids=None, alternative_ids=None):
        super().__init__(split_dir)
        env_d, env_a = _parse_ids_env("CARLA_DRIVABLE_IDS"), _parse_ids_env(
            "CARLA_ALTERNATIVE_IDS"
        )
        self.drivable_ids = (
            drivable_ids if drivable_ids is not None
            else (env_d if env_d is not None else [7])
        )
        self.alternative_ids = (
            alternative_ids if alternative_ids is not None
            else (env_a if env_a is not None else [])
        )

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = _load_pt(self.files[idx])
        image = _image_hwc(s["image"])
        raw = s.get("mask")
        if raw is None:
            mask = np.full(image.shape[:2], 255, np.int32)
        else:
            raw = _normalize_mask(raw)
            mask = np.zeros_like(raw, np.int32)
            mask[np.isin(raw, self.drivable_ids)] = 1
            mask[np.isin(raw, self.alternative_ids)] = 2
        return {"image": image, "mask": mask}


def _extract_yaw(quat) -> float:
    ypr = getattr(quat, "yaw_pitch_roll", None)
    if ypr is not None:
        try:
            return float(ypr[0])
        except Exception:
            pass
    R = getattr(quat, "rotation_matrix", None)
    if R is not None:
        try:
            return math.atan2(float(R[1][0]), float(R[0][0]))
        except Exception:
            pass
    return 0.0


def _canonical_class(name: str) -> Optional[str]:
    n = name.lower()
    table = [
        ("vehicle.car", "car"), ("vehicle.truck", "truck"),
        ("vehicle.bus", "bus"), ("vehicle.trailer", "trailer"),
        ("vehicle.construction", "construction_vehicle"),
        ("construction_vehicle", "construction_vehicle"),
        ("human.pedestrian", "pedestrian"),
        ("vehicle.motorcycle", "motorcycle"), ("vehicle.bicycle", "bicycle"),
        ("movable_object.trafficcone", "traffic_cone"),
        ("traffic_cone", "traffic_cone"),
        ("movable_object.barrier", "barrier"), ("barrier", "barrier"),
    ]
    for prefix, canon in table:
        if n.startswith(prefix):
            return canon
    return None


def boxes_to_arrays(box_list) -> Tuple[np.ndarray, np.ndarray]:
    """Devkit Box-likes (center/wlh/orientation/name) → ([N,7], [N]) arrays
    (nuscenes_loader.py:56-123 semantics)."""
    feats, labels = [], []
    for b in box_list or []:
        cname = _canonical_class(getattr(b, "name", "") or "")
        if cname is None:
            continue
        center = [float(x) for x in list(b.center)]
        wlh = [float(x) for x in list(b.wlh)]
        yaw = _extract_yaw(getattr(b, "orientation", None))
        feats.append(center + wlh + [yaw])
        labels.append(NUSCENES_CLASSES[cname])
    if not feats:
        return np.zeros((0, 7), np.float32), np.zeros((0,), np.int32)
    return np.asarray(feats, np.float32), np.asarray(labels, np.int32)


class NuScenesDataset:
    def __init__(self, cache_dir, lidar_cap: int = 8192, box_cap: int = 64):
        self.files = _list_pt(Path(cache_dir))
        if not self.files:
            raise FileNotFoundError(f"no .pt caches under {cache_dir}")
        self.lidar_cap = lidar_cap
        self.box_cap = box_cap

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        s = _load_pt(self.files[idx])
        raw_boxes = s.get("boxes", [])
        if isinstance(raw_boxes, (list, tuple)):
            b, l = boxes_to_arrays(raw_boxes)
        else:  # already arrays (our packed caches)
            b = _to_np(raw_boxes).astype(np.float32).reshape(-1, 7)
            l = _to_np(s["labels"]).astype(np.int32).reshape(-1)
        boxes, labels = pad_boxes(b, l, self.box_cap, box_dim=7)
        return {
            "image": _image_hwc(s["image"]),
            "lidar": pad_points(_to_np(s["lidar"]).astype(np.float32), self.lidar_cap),
            "intrinsics": _to_np(s["intrinsics"]).astype(np.float32),
            "boxes": boxes,
            "labels": labels,
            "token": s.get("token", ""),
        }


class CarlaSequenceDataset:
    """Sliding windows (t, t+1..t+horizon) over per-run CARLA frames with
    ego-frame waypoint targets."""

    def __init__(
        self,
        split_dir,
        *,
        horizon: int = 8,
        stride: int = 1,
        include_context: bool = True,
        frame_cache_size: int = 256,
    ):
        self.root = Path(split_dir)
        if not self.root.exists():
            raise FileNotFoundError(f"split dir not found: {self.root}")
        self.horizon = int(horizon)
        self.stride = max(1, int(stride))
        self.include_context = include_context

        # index once: {run_dir: [frame files]} (the reference re-globs per
        # frame load — carla_sequence_loader.py:95-104)
        self.run_files: Dict[Path, List[Path]] = {}
        self.index: List[Tuple[Path, int]] = []
        runs = sorted(
            d for d in self.root.iterdir() if d.is_dir() and d.name.startswith("run_")
        )
        for run in runs:
            files = _list_pt(run)
            self.run_files[run] = files
            max_start = len(files) - (1 + self.horizon)
            for t in range(0, max_start + 1, self.stride):
                self.index.append((run, t))
        if not self.index:
            raise RuntimeError(f"no valid windows under {self.root}")

        self._load = lru_cache(maxsize=frame_cache_size)(self._load_uncached)

    def _load_uncached(self, path: Path) -> Dict[str, Any]:
        return _load_pt(path)

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        run, t = self.index[idx]
        files = self.run_files[run]
        current = self._load(files[t])
        futures = [self._load(files[t + k]) for k in range(1, self.horizon + 1)]

        vs = current["vehicle_state"]
        loc_t = _to_np(vs["location"]).astype(np.float32)
        yaw_deg = float(_to_np(vs["rotation"]).astype(np.float32)[1])

        future_xy = np.stack(
            [_to_np(f["vehicle_state"]["location"])[:2] for f in futures]
        ).astype(np.float32)
        waypoints = world_to_ego_xy(future_xy, loc_t[:2], yaw_deg)  # [H,2]

        speeds = np.asarray(
            [float(_to_np(f["vehicle_state"]["speed_kmh"])) for f in futures],
            np.float32,
        )
        controls = np.stack(
            [_to_np(f["vehicle_state"]["control"]).astype(np.float32) for f in futures]
        )  # [H,3] = [throttle, steer, brake]

        out: Dict[str, Any] = {
            "image": _image_hwc(current["image"]),
            "waypoints": waypoints,
            "speed": speeds,
            "throttle": controls[:, 0],
            "steering": controls[:, 1],
            "brake": controls[:, 2],
            "meta": {
                "run_id": current.get("meta", {}).get("run_id", run.name),
                "frame_id": int(current.get("meta", {}).get("frame_id", t)),
            },
        }
        if self.include_context and isinstance(current.get("context"), dict):
            parts = []
            for key in ("weather", "traffic_density"):
                v = current["context"].get(key)
                if v is not None:
                    parts.append(_to_np(v).astype(np.float32).reshape(-1))
            if parts:
                out["context"] = np.concatenate(parts)
        return out
