"""Multi-chip data-parallel serving (`InferenceEngine(mesh=...)` /
`automoe-serve --data-parallel`).

Params replicate, request batches shard P('data') over the mesh —
linear serving scale-out the reference cannot express (its only serving
regime is one process per GPU, inference/run_automoe.py). Pins:
 (a) mesh outputs ≡ single-device outputs on the same weights,
 (b) sub-multiple batches (incl. BS=1 `infer`) repeat-pad internally
     and slice back — callers and the TCP batcher need no changes,
 (c) the int8 quantized trunk composes with the mesh,
 (d) the batching server serves end-to-end over a meshed engine.
"""
from __future__ import annotations

import numpy as np
import pytest

from automoe_tpu.parallel import MeshSpec, make_mesh

CFG = {
    "experts": [
        {"type": "drivable", "num_classes": 3},
        {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
         "fusion": "sum", "use_lidar": False},
    ],
    "gating": {"top_k": 0, "noise_scale": 0.0},
    "context": {"type": "simple"},
    "policy": {"num_waypoints": 4},
}
HW = (64, 80)


@pytest.fixture(scope="module")
def engines():
    import jax.numpy as jnp

    from automoe_tpu.infer.engine import InferenceEngine

    plain = InferenceEngine(
        CFG, camera_hw=HW, model_hw=(64, 64), dtype=jnp.float32
    )
    meshed = InferenceEngine(
        CFG, variables=plain.variables, camera_hw=HW, model_hw=(64, 64),
        dtype=jnp.float32, mesh=make_mesh(MeshSpec(data=8, model=1)),
    )
    return plain, meshed


def _frames(rng, b):
    return rng.integers(0, 256, (b, *HW, 3), dtype=np.uint8)


def test_mesh_matches_single_device(engines, rng):
    plain, meshed = engines
    assert meshed.batch_multiple == 8
    frames, speeds = _frames(rng, 8), np.linspace(0, 30, 8)
    a = plain.infer_batch(frames, speeds)
    b = meshed.infer_batch(frames, speeds)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5)


def test_mesh_pads_submultiple_batches(engines, rng):
    plain, meshed = engines
    frames, speeds = _frames(rng, 3), np.asarray([5.0, 10.0, 15.0])
    a = plain.infer_batch(frames, speeds)
    b = meshed.infer_batch(frames, speeds)
    for k in a:
        assert a[k].shape == b[k].shape  # sliced back to real B=3
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5)
    one = meshed.infer(frames[0], 5.0)
    np.testing.assert_allclose(
        one["waypoints"], a["waypoints"][:1], rtol=1e-4, atol=1e-5
    )


def test_mesh_quantized_trunk(rng):
    import jax.numpy as jnp

    from automoe_tpu.infer.engine import InferenceEngine

    calib = _frames(rng, 2)
    eng = InferenceEngine(
        CFG, camera_hw=HW, model_hw=(64, 64), dtype=jnp.float32,
        quantize=True, calib_frames=calib,
        mesh=make_mesh(MeshSpec(data=8, model=1)),
    )
    out = eng.infer_batch(_frames(rng, 8), np.zeros(8))
    assert out["waypoints"].shape == (8, 4, 2)
    assert np.isfinite(out["waypoints"]).all()


def test_server_over_meshed_engine(engines, rng):
    from automoe_tpu.serving.server import BatchingServer

    _, meshed = engines
    batcher = BatchingServer(meshed, max_batch=8, max_wait_ms=2.0).start()
    try:
        futs = [
            batcher.submit(_frames(rng, 1)[0], float(i)) for i in range(5)
        ]
        outs = [f.result(timeout=60) for f in futs]
    finally:
        batcher.close()
    for o in outs:
        assert np.isfinite(np.asarray(o["waypoints"])).all()
