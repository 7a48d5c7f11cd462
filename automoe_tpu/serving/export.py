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
    # close over NUMPY trees only: closed-over device arrays in a jitted
    # program poison every subsequent dispatch in the session to ~26 ms
    # (CLAUDE.md landmine 1; engine._step threads these as arguments for
    # exactly that reason). numpy constants trace as HLO literals — which
    # is also what inlines the weights into the exported artifact.
    variables = jax.tree.map(np.asarray, engine.variables)
    qexperts = (
        jax.tree.map(np.asarray, engine._qexperts)
        if engine._qexperts is not None else None
    )
    mats = jax.tree.map(np.asarray, engine._mats)

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


def save_serving_bundle(engine, out_dir: Union[str, Path],
                        buckets=(1, 2, 4, 8),
                        platforms: Optional[list] = None) -> Path:
    """Export one artifact per bucket batch size + meta.json, so a server
    can cold-start from compiled programs alone (no model code, no
    checkpoint, no XLA compile). Pairs with serving/server.py's bucketed
    micro-batching: the front-end only ever dispatches bucket sizes."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for b in sorted(set(int(x) for x in buckets)):
        (out / f"b{b}.stablehlo").write_bytes(
            export_serving_step(engine, b, platforms)
        )
    import json

    (out / "meta.json").write_text(json.dumps({
        "camera_hw": list(engine.camera_hw),
        "buckets": sorted(set(int(x) for x in buckets)),
    }))
    return out


class ArtifactEngine:
    """InferenceEngine-compatible facade over a save_serving_bundle dir:
    exposes `camera_hw` and `infer_batch` (bucket batch sizes only), so
    `serving.server.BatchingServer(ArtifactEngine(dir))` serves without
    importing model code or compiling — the production cold-start path.
    The reference has no counterpart (it rebuilds the torch module and
    loads .pth at every startup, inference/run_automoe.py:40-60)."""

    def __init__(self, bundle_dir: Union[str, Path]):
        import json

        d = Path(bundle_dir)
        meta = json.loads((d / "meta.json").read_text())
        self.camera_hw = tuple(meta["camera_hw"])
        self.buckets = list(meta["buckets"])
        self._steps = {
            b: load_serving_step(d / f"b{b}.stablehlo") for b in self.buckets
        }

    def infer_batch(self, frames_u8: np.ndarray, speeds_kmh: np.ndarray):
        b = int(np.asarray(frames_u8).shape[0])
        if b not in self._steps:
            raise ValueError(
                f"no artifact for batch {b}; bundle buckets: {self.buckets}"
            )
        speeds = np.asarray(speeds_kmh, np.float32).reshape(-1, 1)
        out = self._steps[b](np.asarray(frames_u8, np.uint8), speeds)
        return {k: np.asarray(v) for k, v in out.items()}

    def infer(self, frame_u8: np.ndarray, last_speed_kmh: float):
        out = self.infer_batch(
            np.asarray(frame_u8, np.uint8)[None], np.asarray([last_speed_kmh])
        )
        return {k: v[0] for k, v in out.items()}
