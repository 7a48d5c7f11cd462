"""Bilinear resize as two MXU matmuls.

`jax.image.resize` lowers non-integer-ratio resizes to gathers, which run
~40x slower than the rest of the AutoMoE forward on TPU (measured 26.7 ms
for 600x800→256x256 vs 0.65 ms for the whole model). A separable bilinear
resize is `A_h @ x @ A_w^T` with tiny dense interpolation matrices — it
rides the systolic array and fuses with the surrounding normalize ops.

Weight construction mirrors jax.image.resize's LINEAR kernel (half-pixel
centers, tent kernel scaled for anti-aliasing on downsample, edge
renormalization), so numerics match the reference preprocessing. With
`antialias=False` it matches torch's F.interpolate(align_corners=False).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic tent-kernel interpolation weights."""
    scale = out_size / in_size
    # support radius: widen the tent when minifying (anti-aliasing)
    radius = max(1.0, 1.0 / scale) if antialias else 1.0
    out_idx = np.arange(out_size, dtype=np.float64)
    centers = (out_idx + 0.5) / scale - 0.5  # half-pixel mapping
    j = np.arange(in_size, dtype=np.float64)
    dist = np.abs(j[None, :] - centers[:, None]) / radius
    w = np.clip(1.0 - dist, 0.0, None)
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)  # edge renorm
    return w.astype(np.float32)


def resize_weights(
    in_h: int, in_w: int, out_h: int, out_w: int, antialias: bool = True
):
    """Host-side (A_h [out_h,in_h], A_w [out_w,in_w]) interpolation matrices
    as NUMPY arrays.

    Keep them numpy (traced as HLO literals) or pass them as arguments.
    Closing over pre-created *device* arrays instead makes every execution
    of the program — and all subsequent dispatches in the session — pay a
    ~26 ms penalty on the TPU tunnel runtime; as numpy literals or
    arguments the same einsum runs in 0.03 ms.
    """
    return (
        _interp_matrix(in_h, out_h, antialias),
        _interp_matrix(in_w, out_w, antialias),
    )


@functools.lru_cache(maxsize=64)
def mean_of_resize_weights(
    in_h: int, in_w: int, out_h: int, out_w: int, antialias: bool = False
):
    """(u [in_h], v [in_w]) such that mean(resize(x)) == u^T x v exactly.

    mean over the resized map is linear: mean_o(A x A'^T) = (mean of A's
    rows) x (mean of A''s rows)^T. Lets the gating extractors pool the
    experts' LOW-RES logits without materialising the [B,H,W,C] upsampled
    map (pure HBM traffic on the serving path).
    """
    u = _interp_matrix(in_h, out_h, antialias).mean(axis=0)
    v = _interp_matrix(in_w, out_w, antialias).mean(axis=0)
    return u.astype(np.float32), v.astype(np.float32)


def resize_bilinear(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    *,
    antialias: bool = True,
    mats=None,
) -> jnp.ndarray:
    """[B, H, W, C] → [B, out_h, out_w, C] separable bilinear resize.

    `mats`: optional (A_h, A_w) from `resize_weights`, passed as runtime
    arguments (see note there). When None, small matrices are embedded as
    constants — fine for the experts' 8→256 upsample, pathological for
    camera-frame downsizing.
    """
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    dtype = x.dtype
    if mats is None:
        mats = resize_weights(H, W, out_h, out_w, antialias)
    ah = jnp.asarray(mats[0], dtype)  # [oh, H]
    aw = jnp.asarray(mats[1], dtype)  # [ow, W]
    # Contract the axis that makes the SMALLER intermediate first — the
    # two matmuls are HBM-bound at camera sizes and the intermediate is
    # written+read once. Measured 600x800→256² B=128 bf16 on v5e:
    # W-first 0.77 ms vs H-first 3.5 ms (benchmarks/BENCHMARKS.md).
    if out_h * W <= H * out_w:
        # H first: [oh,H] x [B,H,W,C] -> [B,oh,W,C], then W
        y = jnp.einsum("oh,bhwc->bowc", ah, x)
        return jnp.einsum("ow,bhwc->bhoc", aw, y)
    # W first: [ow,W] x [B,H,W,C] -> [B,H,ow,C], then H
    y = jnp.einsum("ow,bhwc->bhoc", aw, x)
    return jnp.einsum("oh,bhwc->bowc", ah, y)
