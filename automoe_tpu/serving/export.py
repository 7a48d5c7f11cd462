"""AOT model export: serialize the serving step to a StableHLO artifact.

Deployment parity-plus: the reference serves by reconstructing the torch
module tree in Python and loading a state dict (inference/
run_automoe.py:144-157). Here the ENTIRE serving computation — preprocess
+ AutoMoE forward (bf16 or the int8 PTQ variant), weights baked in as
constants — exports to one portable `jax.export` artifact that a serving
host runs without any model code, config, or checkpoint plumbing:

    blob = export_serving_step(engine)            # bytes
    step = load_serving_step(blob)                 # callable
    out  = step(frames_u8, speed_kmh)              # {'waypoints': ...}

Artifacts record the target platform (tpu/cpu) and the exact input
shapes; jax.export verifies both at call time.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax
import jax.export
import jax.numpy as jnp
import numpy as np


def export_serving_step(engine, batch_size: int = 1,
                        platforms: Optional[list] = None) -> bytes:
    """Serialize an InferenceEngine's jitted step (weights inlined) for
    `batch_size` frames. The artifact takes (frames_u8 [B,H,W,3] uint8,
    speed_kmh [B,1] f32) and returns the engine's output dict."""
    h, w = engine.camera_hw
    variables = engine.variables
    qexperts = engine._qexperts
    mats = engine._mats

    def step(frames_u8, speed_kmh):
        return engine._step(variables, qexperts, mats, frames_u8, speed_kmh)

    args = (
        jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, 1), jnp.float32),
    )
    exported = jax.export.export(
        jax.jit(step), platforms=platforms
    )(*args)
    return exported.serialize()


def load_serving_step(blob: Union[bytes, str, Path]):
    """Rehydrate an exported serving step. Accepts the serialized bytes or
    a path to them. Returns fn(frames_u8, speed_kmh) -> outputs dict."""
    if not isinstance(blob, (bytes, bytearray)):
        blob = Path(blob).read_bytes()
    exported = jax.export.deserialize(bytearray(blob))

    def step(frames_u8, speed_kmh):
        return exported.call(jnp.asarray(frames_u8), jnp.asarray(speed_kmh))

    return step


def save_serving_artifact(engine, path: Union[str, Path],
                          batch_size: int = 1,
                          platforms: Optional[list] = None) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(export_serving_step(engine, batch_size, platforms))
    return path
