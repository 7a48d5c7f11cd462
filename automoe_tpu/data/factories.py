"""The eight loader factory functions (API parity with reference
dataloaders/__init__.py:1-19), returning automoe_tpu DataLoaders that yield
fixed-shape NHWC numpy batches.

Defaults mirror the reference (batch 32, 4 workers, shuffle/drop_last on
train). `num_shards`/`shard_index` replace DistributedSampler; pass
`device_put_fn=parallel.shard_batch` partial to stream onto the mesh.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

from automoe_tpu.data.datasets import (
    BDDDetectionDataset,
    BDDDrivableDataset,
    BDDSegmentationDataset,
    CarlaDetectionDataset,
    CarlaDrivableDataset,
    CarlaSegmentationDataset,
    CarlaSequenceDataset,
    NuScenesDataset,
)
from automoe_tpu.data.loader import DataLoader

BDD_DETECTION_ROOT = "datasets/bdd100k/preprocessed/detection"
BDD_SEGMENTATION_ROOT = "datasets/bdd100k/preprocessed/segmentation"
BDD_DRIVABLE_ROOT = "datasets/bdd100k/preprocessed/drivable"
NUSCENES_ROOT = "datasets/nuscenes/preprocessed"
CARLA_ROOT = "datasets/carla/preprocessed"


def _packed_dataset(packed_root, split, expect: Optional[dict] = None):
    """Open <packed_root>/<split> as a packed frame cache — native C++
    reader when it builds, python memmap reader otherwise.

    `expect` maps field -> expected leading row dim (e.g. {'bboxes': 48}
    for box_cap): the cache was built with its own caps/horizon, and a
    silent mismatch would surface as an opaque shape error deep inside
    the jitted loss — validate it here instead."""
    d = Path(packed_root) / split
    try:
        from automoe_tpu.data.native_packed import NativePackedDataset

        ds = NativePackedDataset(d)
    except Exception:
        from automoe_tpu.data.packed import PackedFrameDataset

        ds = PackedFrameDataset(d)
    for field, want in (expect or {}).items():
        if want is None:
            continue
        if hasattr(ds, "row_shapes"):
            shape = ds.row_shapes.get(field)
        else:
            arr = getattr(ds, "_mm", {}).get(field)
            shape = tuple(arr.shape[1:]) if arr is not None else None
        if shape and shape[0] != want:
            raise ValueError(
                f"packed cache {d} was built with {field} leading dim "
                f"{shape[0]}, but the loader requested {want} — repack "
                f"with automoe-pack or match the CLI flags to the cache"
            )
    return ds


def _mk_loader(dataset, split, batch_size, num_workers, shuffle, **kw):
    if shuffle is None:
        shuffle = split == "train"
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        num_workers=num_workers,
        drop_last=(split == "train"),
        **kw,
    )


def get_bdd_detection_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=BDD_DETECTION_ROOT, box_cap=48, packed_root=None, **kw,
):
    if packed_root:
        ds = _packed_dataset(packed_root, split, expect={"bboxes": box_cap})
    else:
        ds = BDDDetectionDataset(Path(root_dir) / split, box_cap=box_cap)
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)


def get_bdd_segmentation_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=BDD_SEGMENTATION_ROOT, raw_root=None, packed_root=None, **kw,
):
    if packed_root:
        ds = _packed_dataset(packed_root, split)
    else:
        ds = BDDSegmentationDataset(Path(root_dir) / split, raw_root=raw_root)
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)


def get_bdd_drivable_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=BDD_DRIVABLE_ROOT, base_dir=None, raw_root=None, packed_root=None, **kw,
):
    root = base_dir if base_dir is not None else root_dir
    if packed_root:
        ds = _packed_dataset(packed_root, split)
    else:
        ds = BDDDrivableDataset(Path(root) / split, raw_root=raw_root)
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)


def get_nuscenes_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=NUSCENES_ROOT, lidar_cap=8192, box_cap=64, packed_root=None, **kw,
):
    if packed_root:
        ds = _packed_dataset(
            packed_root, split,
            expect={"lidar": lidar_cap, "boxes": box_cap},
        )
    else:
        ds = NuScenesDataset(Path(root_dir) / split, lidar_cap=lidar_cap, box_cap=box_cap)
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)


def get_carla_sequence_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=CARLA_ROOT, horizon=8, stride=1, include_context=True, past=0,
    packed_root=None, **kw,
):
    del past  # reserved-but-unused in the reference too
    if packed_root:
        # a pack_carla_sequences cache (automoe-pack carla-sequences)
        ds = _packed_dataset(
            packed_root, split, expect={"waypoints": horizon}
        )
    else:
        ds = CarlaSequenceDataset(
            Path(root_dir) / split,
            horizon=horizon,
            stride=stride,
            include_context=include_context,
        )
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)


def get_carla_detection_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=CARLA_ROOT, box_cap=48, packed_root=None, **kw,
):
    if packed_root:
        ds = _packed_dataset(packed_root, split, expect={"bboxes": box_cap})
    else:
        ds = CarlaDetectionDataset(Path(root_dir) / split, box_cap=box_cap)
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)


def get_carla_segmentation_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=CARLA_ROOT, packed_root=None, num_classes=19, **kw,
):
    if packed_root:
        ds = _packed_dataset(packed_root, split)
    else:
        ds = CarlaSegmentationDataset(
            Path(root_dir) / split, num_classes=num_classes
        )
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)


def get_carla_drivable_loader(
    split="train", batch_size=32, num_workers=4, shuffle=None,
    root_dir=CARLA_ROOT, drivable_ids=None, alternative_ids=None,
    packed_root=None, **kw,
):
    if packed_root:
        ds = _packed_dataset(packed_root, split)
    else:
        ds = CarlaDrivableDataset(
            Path(root_dir) / split,
            drivable_ids=drivable_ids,
            alternative_ids=alternative_ids,
        )
    return _mk_loader(ds, split, batch_size, num_workers, shuffle, **kw)
