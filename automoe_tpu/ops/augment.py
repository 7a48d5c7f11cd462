"""Fused on-device data augmentation (north-star data plane, r5).

The reference has NO augmentation anywhere (verified: no flip/crop/
jitter in /root/reference/dataloaders/* or training/*), so every expert
pipeline here keeps augmentation OFF by default — parity preserved. The
driver's north star, however, names "decode-resize-normalize-AUGMENT"
as the fused on-device preprocessing chain (BASELINE.json), and on a
TPU the right place for augmentation is INSIDE the jitted train step:
the batch is already in HBM, the ops fuse into the step's HLO (no extra
host round-trip, no python per-sample loop), and the PRNG is the step's
own threaded key — bit-reproducible given (seed, step).

Ops (all static-shape, batch-level, vmapped per sample):
  * random resized crop — per-sample scale in `scale_range`, random
    offset, bilinear resample back to (H, W) via gather-based affine
    sampling (separable take along H then W: two gathers + one lerp
    each, MXU-free and bandwidth-bound, exactly what the VPU is for).
    Masks ride the SAME per-sample window with nearest sampling;
    boxes are remapped analytically (no resampling).
  * horizontal flip — probability `hflip_prob` per sample; boxes
    x -> W - x (x1/x2 swap), masks flip with the image.
  * color jitter — per-sample brightness/contrast/saturation factors.
    Linear ops only (no clipping): the loaders hand the step
    already-normalized floats, where range clipping would be wrong.

Label geometry: a box that leaves the crop (or collapses below
`min_box_px` after clipping) gets label -1 — the same ignore code the
fixed-cap collate uses for padding, so the set-matching losses drop it
with no shape change (losses/detection.py). Segmentation pixels pulled
in from outside the crop never exist (offsets keep the window inside
the frame). Round-trip pins: tests/test_augment.py.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    hflip_prob: float = 0.5
    #: random-resized-crop scale range (1.0, 1.0) disables cropping
    scale_range: Tuple[float, float] = (0.8, 1.0)
    brightness: float = 0.2  # factor in [1-b, 1+b]; 0 disables
    contrast: float = 0.2
    saturation: float = 0.2
    #: boxes thinner than this (pixels, post-crop) become ignore (-1)
    min_box_px: float = 2.0


def sample_params(rng, batch: int, cfg: AugmentConfig) -> Dict[str, jnp.ndarray]:
    """Per-sample augmentation parameters, one fold of the step RNG."""
    ks = jax.random.split(rng, 6)
    lo, hi = cfg.scale_range
    scale = jax.random.uniform(ks[0], (batch,), minval=lo, maxval=hi)
    # offsets as a fraction of the slack (H - s*H), so the window always
    # stays inside the frame
    off_y = jax.random.uniform(ks[1], (batch,))
    off_x = jax.random.uniform(ks[2], (batch,))
    flip = jax.random.bernoulli(ks[3], cfg.hflip_prob, (batch,))
    jit = jax.random.uniform(ks[4], (batch, 3), minval=-1.0, maxval=1.0)
    return {
        "scale": scale, "off_y": off_y, "off_x": off_x, "flip": flip,
        "brightness": 1.0 + cfg.brightness * jit[:, 0],
        "contrast": 1.0 + cfg.contrast * jit[:, 1],
        "saturation": 1.0 + cfg.saturation * jit[:, 2],
    }


def _axis_coords(n: int, start, scale):
    """Source coordinates for n output pixels sampling a window of
    n*scale source pixels beginning at `start` (align_corners=False)."""
    i = jnp.arange(n, dtype=jnp.float32)
    return start + (i + 0.5) * scale - 0.5


def _take_lerp(img, coords, axis):
    """Separable bilinear along one axis via two gathers + lerp."""
    n = img.shape[axis]
    c0 = jnp.floor(coords)
    t = (coords - c0)
    i0 = jnp.clip(c0.astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    a = jnp.take(img, i0, axis=axis)
    b = jnp.take(img, i1, axis=axis)
    shape = [1] * a.ndim
    shape[axis] = -1
    t = t.reshape(shape).astype(img.dtype)
    return a * (1 - t) + b * t


def _take_nearest(img, coords, axis):
    n = img.shape[axis]
    i = jnp.clip(jnp.round(coords).astype(jnp.int32), 0, n - 1)
    return jnp.take(img, i, axis=axis)


def _crop_one(img, scale, off_y, off_x, *, nearest: bool):
    """Resample one [H, W, ...] image from its per-sample crop window
    back to full resolution."""
    H, W = img.shape[0], img.shape[1]
    y0 = off_y * H * (1.0 - scale)
    x0 = off_x * W * (1.0 - scale)
    ys = _axis_coords(H, y0, scale)
    xs = _axis_coords(W, x0, scale)
    take = _take_nearest if nearest else _take_lerp
    return take(take(img, ys, 0), xs, 1)


def _flip_one(img, flip):
    return jnp.where(flip, img[:, ::-1], img)


def _color_one(img, brightness, contrast, saturation):
    x = img * brightness
    mean = jnp.mean(x)
    x = (x - mean) * contrast + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    return gray + (x - gray) * saturation


def augment_images(image, params, *, color: bool = True):
    """[B, H, W, C] float images through crop+flip(+color)."""
    out = jax.vmap(
        lambda im, s, oy, ox: _crop_one(im, s, oy, ox, nearest=False)
    )(image, params["scale"], params["off_y"], params["off_x"])
    out = jax.vmap(_flip_one)(out, params["flip"])
    if color:
        out = jax.vmap(_color_one)(
            out, params["brightness"], params["contrast"],
            params["saturation"],
        )
    return out.astype(image.dtype)


def augment_masks(mask, params):
    """[B, H, W] integer masks ride the SAME window, nearest-sampled."""
    out = jax.vmap(
        lambda m, s, oy, ox: _crop_one(m, s, oy, ox, nearest=True)
    )(mask, params["scale"], params["off_y"], params["off_x"])
    return jax.vmap(_flip_one)(out, params["flip"])


def transform_boxes(bboxes, labels, params, hw: Tuple[int, int],
                    min_box_px: float = 2.0):
    """Remap [B, cap, 4] xyxy pixel boxes through the per-sample crop +
    flip. Output coords are in the SAME (H, W) pixel frame (the crop is
    resampled back to full resolution, so coordinates scale by 1/s).
    Boxes clipped below `min_box_px` in either dim get label -1."""
    H, W = hw
    s = params["scale"][:, None]
    y0 = (params["off_y"] * H)[:, None] * (1.0 - s[:, 0])[:, None]
    x0 = (params["off_x"] * W)[:, None] * (1.0 - s[:, 0])[:, None]
    x1, y1, x2, y2 = (bboxes[..., 0], bboxes[..., 1],
                      bboxes[..., 2], bboxes[..., 3])
    # window [x0, x0+s*W] maps to [0, W]  =>  x' = (x - x0) / s
    x1p, x2p = (x1 - x0) / s, (x2 - x0) / s
    y1p, y2p = (y1 - y0) / s, (y2 - y0) / s
    x1c = jnp.clip(x1p, 0.0, float(W))
    x2c = jnp.clip(x2p, 0.0, float(W))
    y1c = jnp.clip(y1p, 0.0, float(H))
    y2c = jnp.clip(y2p, 0.0, float(H))
    flip = params["flip"][:, None]
    fx1 = jnp.where(flip, W - x2c, x1c)
    fx2 = jnp.where(flip, W - x1c, x2c)
    out = jnp.stack([fx1, y1c, fx2, y2c], axis=-1)
    alive = ((fx2 - fx1) >= min_box_px) & ((y2c - y1c) >= min_box_px)
    new_labels = jnp.where(alive, labels, -1)
    return out.astype(bboxes.dtype), new_labels.astype(labels.dtype)


def augment_detection(batch: Dict, rng, cfg: Optional[AugmentConfig] = None) -> Dict:
    """{image, bboxes, labels} through one consistent augmentation."""
    cfg = cfg or AugmentConfig()
    B, H, W = batch["image"].shape[0], batch["image"].shape[1], batch["image"].shape[2]
    params = sample_params(rng, B, cfg)
    out = dict(batch)
    out["image"] = augment_images(batch["image"], params)
    out["bboxes"], out["labels"] = transform_boxes(
        batch["bboxes"], batch["labels"], params, (H, W),
        min_box_px=cfg.min_box_px,
    )
    return out


def augment_segmentation(batch: Dict, rng, cfg: Optional[AugmentConfig] = None) -> Dict:
    """{image, mask} through one consistent augmentation (mask nearest)."""
    cfg = cfg or AugmentConfig()
    B = batch["image"].shape[0]
    params = sample_params(rng, B, cfg)
    out = dict(batch)
    out["image"] = augment_images(batch["image"], params)
    out["mask"] = augment_masks(batch["mask"], params)
    return out
