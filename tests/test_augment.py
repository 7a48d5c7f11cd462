"""On-device augmentation: label-geometry round trips + train-step
integration (ops/augment.py; north-star data plane, r5).

The reference has no augmentation — these pins are against geometry
ground truth (numpy mirrors of the affine window), not a torch oracle.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from automoe_tpu.ops.augment import (
    AugmentConfig,
    augment_detection,
    augment_images,
    augment_masks,
    augment_segmentation,
    sample_params,
    transform_boxes,
)

IDENTITY = AugmentConfig(
    hflip_prob=0.0, scale_range=(1.0, 1.0),
    brightness=0.0, contrast=0.0, saturation=0.0,
)


def _params(B, scale=1.0, off_y=0.0, off_x=0.0, flip=False):
    return {
        "scale": jnp.full((B,), scale, jnp.float32),
        "off_y": jnp.full((B,), off_y, jnp.float32),
        "off_x": jnp.full((B,), off_x, jnp.float32),
        "flip": jnp.full((B,), flip, bool),
        "brightness": jnp.ones((B,), jnp.float32),
        "contrast": jnp.ones((B,), jnp.float32),
        "saturation": jnp.ones((B,), jnp.float32),
    }


def test_identity_config_is_noop(rng):
    img = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    boxes = np.array([[[2, 3, 10, 12], [0, 0, 0, 0]]] * 2, np.float32)
    labels = np.array([[3, -1]] * 2, np.int32)
    batch = {"image": img, "bboxes": boxes, "labels": labels}
    out = jax.jit(
        lambda b, k: augment_detection(b, k, IDENTITY)
    )(batch, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out["image"]), img, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["bboxes"]), boxes, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["labels"]), labels)


def test_hflip_involution(rng):
    img = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
    p = _params(2, flip=True)
    once = augment_images(jnp.asarray(img), p, color=False)
    twice = augment_images(once, p, color=False)
    np.testing.assert_allclose(np.asarray(twice), img, atol=1e-6)
    # boxes: flip twice = identity
    boxes = np.array([[[1, 2, 5, 7]]] * 2, np.float32)
    labels = np.array([[4]] * 2, np.int32)
    b1, l1 = transform_boxes(jnp.asarray(boxes), jnp.asarray(labels), p,
                             (8, 12))
    b2, l2 = transform_boxes(b1, l1, p, (8, 12))
    np.testing.assert_allclose(np.asarray(b2), boxes, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(l2), labels)
    # flipped box mirrors around W: x1' = W - x2
    np.testing.assert_allclose(np.asarray(b1)[0, 0], [12 - 5, 2, 12 - 1, 7],
                               atol=1e-5)


def test_crop_box_geometry_matches_numpy():
    """A box through a known crop window maps per x' = (x - x0)/s."""
    H = W = 32
    s, oy, ox = 0.5, 0.25, 0.5
    p = _params(1, scale=s, off_y=oy, off_x=ox)
    # window: y0 = 0.25*32*0.5 = 4, x0 = 0.5*32*0.5 = 8; size 16x16
    boxes = np.array([[[10.0, 6.0, 20.0, 14.0]]], np.float32)
    labels = np.array([[2]], np.int32)
    out, lab = transform_boxes(jnp.asarray(boxes), jnp.asarray(labels), p,
                               (H, W))
    exp = np.array([(10 - 8) / s, (6 - 4) / s, (20 - 8) / s, (14 - 4) / s])
    np.testing.assert_allclose(np.asarray(out)[0, 0], exp, atol=1e-4)
    assert np.asarray(lab)[0, 0] == 2


def test_box_leaving_crop_becomes_ignore():
    H = W = 32
    p = _params(1, scale=0.5, off_y=0.0, off_x=0.0)  # window [0,16)²
    boxes = np.array(
        [[[20.0, 20.0, 28.0, 28.0],   # fully outside -> dead
          [4.0, 4.0, 10.0, 10.0]]], np.float32)  # inside -> alive
    labels = np.array([[5, 7]], np.int32)
    out, lab = transform_boxes(jnp.asarray(boxes), jnp.asarray(labels), p,
                               (H, W))
    assert np.asarray(lab)[0, 0] == -1
    assert np.asarray(lab)[0, 1] == 7
    # clipped coords stay inside the frame
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= W).all()


def test_mask_rides_same_window_nearest():
    """Mask sampling mirrors the numpy formula for the same window."""
    H = W = 16
    mask = np.arange(H * W, dtype=np.int32).reshape(1, H, W)
    s, oy, ox = 0.5, 1.0, 0.0  # y0 = 8, x0 = 0
    p = _params(1, scale=s, off_y=oy, off_x=ox)
    out = np.asarray(augment_masks(jnp.asarray(mask), p))
    ys = 8 + (np.arange(H) + 0.5) * s - 0.5
    xs = 0 + (np.arange(W) + 0.5) * s - 0.5
    yi = np.clip(np.round(ys).astype(int), 0, H - 1)
    xi = np.clip(np.round(xs).astype(int), 0, W - 1)
    np.testing.assert_array_equal(out[0], mask[0][yi][:, xi])


def test_seg_image_mask_consistency(rng):
    """Piecewise-constant (8px blocks) image channel == mask: away from
    block boundaries the bilinear image and nearest mask must agree
    after the SAME random window."""
    H = W = 32
    blocks = rng.integers(0, 5, (1, 4, 4)).astype(np.int32)
    mask = np.kron(blocks, np.ones((8, 8), np.int32))
    img = np.repeat(mask[..., None].astype(np.float32), 3, axis=-1)
    batch = {"image": img, "mask": mask}
    cfg = AugmentConfig(brightness=0.0, contrast=0.0, saturation=0.0)
    out = augment_segmentation(batch, jax.random.key(3), cfg)
    oi = np.asarray(out["image"])[0, ..., 0]
    om = np.asarray(out["mask"])[0]
    agree = np.isclose(oi, om.astype(np.float32), atol=1e-4)
    # boundaries blur under bilinear; the interiors must agree (8px
    # blocks on a <=1.25x zoom leave >3/4 of pixels block-interior)
    assert agree.mean() > 0.75, agree.mean()


def test_color_jitter_changes_image_only(rng):
    img = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    boxes = np.array([[[1, 1, 6, 6]]] * 2, np.float32)
    labels = np.array([[0]] * 2, np.int32)
    cfg = AugmentConfig(hflip_prob=0.0, scale_range=(1.0, 1.0),
                        brightness=0.5, contrast=0.5, saturation=0.5)
    out = augment_detection(
        {"image": img, "bboxes": boxes, "labels": labels},
        jax.random.key(1), cfg,
    )
    assert not np.allclose(np.asarray(out["image"]), img)
    np.testing.assert_allclose(np.asarray(out["bboxes"]), boxes, atol=1e-5)


def test_deterministic_in_key(rng):
    img = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)
    batch = {"image": img,
             "bboxes": np.zeros((3, 4, 4), np.float32),
             "labels": np.full((3, 4), -1, np.int32)}
    a = augment_detection(batch, jax.random.key(9))
    b = augment_detection(batch, jax.random.key(9))
    c = augment_detection(batch, jax.random.key(10))
    np.testing.assert_array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
    assert not np.array_equal(np.asarray(a["image"]), np.asarray(c["image"]))


@pytest.mark.parametrize("task", ["detection", "drivable"])
def test_train_step_integration(task, rng):
    """augment=True: train loss runs under jit and differs from the
    unaugmented loss; eval (train=False) is bit-identical to the
    augment=False workload — validation is never augmented."""
    from automoe_tpu.train.workloads import bdd_expert_workload

    wl_a = bdd_expert_workload(task, image_size=32, box_cap=4,
                               augment=True, matcher="auction")
    wl_p = bdd_expert_workload(task, image_size=32, box_cap=4,
                               matcher="auction")
    if task == "detection":
        batch = {
            "image": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
            "bboxes": np.array(
                [[[2, 2, 20, 20], [5, 8, 28, 30], [0, 0, 0, 0],
                  [0, 0, 0, 0]]] * 2, np.float32),
            "labels": np.array([[1, 2, -1, -1]] * 2, np.int32),
        }
    else:
        batch = {
            "image": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
            "mask": rng.integers(0, 3, (2, 32, 32)).astype(np.int32),
        }
    variables = wl_a.init_variables(jax.random.key(0))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    key = jax.random.key(5)

    loss_a, _ = jax.jit(wl_a.loss_fn, static_argnames="train")(
        params, stats, batch, key, train=True
    )
    loss_p, _ = jax.jit(wl_p.loss_fn, static_argnames="train")(
        params, stats, batch, key, train=True
    )
    assert np.isfinite(float(loss_a))
    assert float(loss_a) != pytest.approx(float(loss_p), rel=1e-6)

    val_a, _ = wl_a.loss_fn(params, stats, batch, key, False)
    val_p, _ = wl_p.loss_fn(params, stats, batch, key, False)
    np.testing.assert_allclose(float(val_a), float(val_p), rtol=1e-6)
