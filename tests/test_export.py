"""AOT serving export: serialize → reload → outputs identical."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
@pytest.mark.parametrize("quantize", [False, True])
def test_export_roundtrip(tmp_path, rng, quantize):
    from automoe_tpu.infer.engine import InferenceEngine
    from automoe_tpu.serving import load_serving_step, save_serving_artifact

    engine = InferenceEngine(
        CFG, camera_hw=(120, 160), model_hw=(64, 64), dtype=jnp.float32,
        quantize=quantize,
    )
    frame = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    ref = engine.infer(frame, 12.0)

    path = save_serving_artifact(engine, tmp_path / "automoe.stablehlo")
    assert path.stat().st_size > 1000
    step = load_serving_step(path)
    out = step(frame[None], np.asarray([[12.0]], np.float32))
    for k in ("waypoints", "speed", "expert_weights"):
        np.testing.assert_allclose(
            np.asarray(out[k]), ref[k], rtol=1e-5, atol=1e-6, err_msg=k
        )

    # shape mismatch is rejected, not miscomputed
    with pytest.raises(Exception):
        step(np.zeros((2, 120, 160, 3), np.uint8),
             np.zeros((2, 1), np.float32))


@pytest.mark.slow
def test_artifact_engine_serves_bundle(tmp_path, rng):
    """save_serving_bundle -> ArtifactEngine -> BatchingServer: the full
    cold-start serving path (compiled artifacts only, no model code /
    checkpoint / compile at startup) returns the live engine's outputs."""
    from automoe_tpu.infer.engine import InferenceEngine
    from automoe_tpu.serving import ArtifactEngine, save_serving_bundle
    from automoe_tpu.serving.server import BatchingServer

    engine = InferenceEngine(
        CFG, camera_hw=(120, 160), model_hw=(64, 64), dtype=jnp.float32,
    )
    bundle = save_serving_bundle(engine, tmp_path / "bundle", buckets=(1, 2))
    art = ArtifactEngine(bundle)
    assert art.camera_hw == (120, 160) and art.buckets == [1, 2]

    frames = rng.integers(0, 255, (2, 120, 160, 3), dtype=np.uint8)
    live = engine.infer_batch(frames, np.asarray([3.0, 9.0]))
    cold = art.infer_batch(frames, np.asarray([3.0, 9.0]))
    for k in ("waypoints", "speed", "expert_weights"):
        np.testing.assert_allclose(cold[k], live[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)

    # non-bucket batch is rejected with a clear error
    with pytest.raises(ValueError, match="no artifact for batch 3"):
        art.infer_batch(
            rng.integers(0, 255, (3, 120, 160, 3), dtype=np.uint8),
            np.zeros(3),
        )

    # and it drops into the micro-batching front-end unchanged
    with BatchingServer(art, max_batch=2, max_wait_ms=50) as srv:
        row = srv.infer(frames[0], 3.0)
    np.testing.assert_allclose(row["waypoints"], live["waypoints"][0],
                               rtol=1e-5, atol=1e-6)
