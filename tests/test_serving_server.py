"""Micro-batching serving front-end (serving/server.py): batching
semantics, result-row fidelity vs direct engine calls, and the TCP
protocol round trip. Runs a tiny AutoMoE on the CPU backend."""
import threading
import time

import numpy as np
import pytest

TINY_CFG = {
    "experts": [
        {"type": "drivable", "num_classes": 3},
    ],
    "gating": {"top_k": 0, "noise_scale": 0.0},
    "context": {"type": "simple"},
    "policy": {"num_waypoints": 4},
}
CAM_HW = (48, 64)


@pytest.fixture(scope="module")
def engine():
    from automoe_tpu.infer.engine import InferenceEngine

    return InferenceEngine(TINY_CFG, camera_hw=CAM_HW, model_hw=(32, 32))


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, *CAM_HW, 3), dtype=np.uint8)


def test_infer_batch_matches_single(engine):
    frames = _frames(3)
    speeds = np.array([10.0, 20.0, 30.0])
    batched = engine.infer_batch(frames, speeds)
    assert batched["waypoints"].shape[0] == 3
    for i in range(3):
        single = engine.infer(frames[i], float(speeds[i]))
        np.testing.assert_allclose(
            batched["waypoints"][i], single["waypoints"][0],
            rtol=2e-2, atol=2e-2,  # bf16 batch-position noise
        )


def test_batching_server_groups_and_matches(engine):
    from automoe_tpu.serving.server import BatchingServer

    frames = _frames(8, seed=1)
    with BatchingServer(engine, max_batch=4, max_wait_ms=80) as srv:
        futs = [srv.submit(frames[i], float(i)) for i in range(8)]
        rows = [f.result(timeout=60) for f in futs]
    assert srv.stats["requests"] == 8
    # concurrency: fewer device batches than requests
    assert srv.stats["batches"] < 8
    assert srv.stats["max_batch_seen"] >= 2
    ref = engine.infer_batch(frames, np.arange(8, dtype=np.float32))
    for i, row in enumerate(rows):
        assert row["waypoints"].shape == ref["waypoints"][i].shape
        np.testing.assert_allclose(
            row["waypoints"], ref["waypoints"][i], rtol=2e-2, atol=2e-2
        )


def test_batching_server_bucket_padding(engine):
    from automoe_tpu.serving.server import BatchingServer

    srv = BatchingServer(engine, max_batch=4, max_wait_ms=40)
    assert srv.buckets == [1, 2, 4]
    assert srv._bucket_for(3) == 4
    with srv:
        out = srv.infer(_frames(1)[0], 5.0)
    assert out["waypoints"].ndim == 2


def test_tcp_round_trip(engine):
    from automoe_tpu.serving.server import BatchingServer, Client, serve_tcp

    frames = _frames(4, seed=2)
    with BatchingServer(engine, max_batch=4, max_wait_ms=40) as batcher:
        tcp = serve_tcp(batcher)
        try:
            port = tcp.server_address[1]
            results = {}

            def call(i):
                c = Client("127.0.0.1", port)
                try:
                    results[i] = c.infer(frames[i], float(10 * i))
                finally:
                    c.close()

            threads = [
                threading.Thread(target=call, args=(i,)) for i in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert set(results) == {0, 1, 2, 3}
            ref = engine.infer_batch(
                frames, np.array([0.0, 10.0, 20.0, 30.0])
            )
            for i in range(4):
                np.testing.assert_allclose(
                    results[i]["waypoints"], ref["waypoints"][i],
                    rtol=2e-2, atol=2e-2,
                )
                assert np.isfinite(results[i]["expert_weights"]).all()
        finally:
            tcp.shutdown()
            tcp.server_close()


def test_tcp_error_path(engine):
    from automoe_tpu.serving.server import (
        BatchingServer, _recv_msg, _send_msg, serve_tcp,
    )
    import socket

    with BatchingServer(engine, max_batch=2, max_wait_ms=10) as batcher:
        tcp = serve_tcp(batcher)
        try:
            sock = socket.create_connection(
                ("127.0.0.1", tcp.server_address[1])
            )
            # wrong frame size → server must answer with an error header
            _send_msg(sock, {"speed_kmh": 0.0, "height": 2, "width": 2},
                      b"\x00" * 12)
            out, _ = _recv_msg(sock)
            assert "error" in out
            sock.close()
        finally:
            tcp.shutdown()
            tcp.server_close()


def test_serve_cli_boot_and_query(tmp_path, rng):
    """automoe-serve main(): builds the engine, boots the TCP front-end,
    answers a client request; orbax-checkpoint serving restores trained
    weights (run_automoe --checkpoint <orbax dir> shares the path)."""
    import json as _json

    from automoe_tpu.serving.cli import main as serve_main
    from automoe_tpu.serving.server import Client

    cfg = {
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(_json.dumps(cfg))
    srv, batcher = serve_main([
        "--model-config", str(cfg_path), "--fp32",
        "--camera-hw", "120", "160", "--model-hw", "64", "64",
        "--port", "0", "--max-batch", "2", "--max-wait-ms", "20",
    ], block=False)
    try:
        host, port = srv.server_address[:2]
        c = Client(host, port)
        frame = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        out = c.infer(frame, 10.0)
        assert out["waypoints"].shape == (4, 2)
        assert np.isfinite(out["waypoints"]).all()
        stats = c.stats()
        assert stats["stats"]["requests"] >= 1
        assert stats["buckets"] == [1, 2]
        c.close()
    finally:
        srv.shutdown()
        batcher.close()


def test_engine_from_orbax_checkpoint(tmp_path):
    """InferenceEngine.from_orbax_checkpoint restores trainer-written
    weights (the --checkpoint <dir> branch previously fell through to
    random init)."""
    import jax
    import jax.numpy as jnp

    from automoe_tpu.ckpt.checkpoint import CheckpointManager
    from automoe_tpu.infer.engine import InferenceEngine
    from automoe_tpu.train import TrainState, make_optimizer

    cfg = {
        "experts": [
            {"type": "drivable", "num_classes": 3},
            {"type": "nuscenes", "num_queries": 8, "bbox_dim": 4,
             "fusion": "sum", "use_lidar": False},
        ],
        "gating": {"top_k": 0, "noise_scale": 0.0},
        "context": {"type": "simple"},
        "policy": {"num_waypoints": 4},
    }
    # a "trained" model: init an engine, perturb a leaf, checkpoint it
    donor = InferenceEngine(
        cfg, camera_hw=(120, 160), model_hw=(64, 64), dtype=jnp.float32
    )
    params = jax.tree.map(lambda x: x + 0.25, donor.variables["params"])
    tx = make_optimizer(learning_rate=1e-3, weight_decay=0.0, total_steps=1)
    state = TrainState.create(
        params=params, tx=tx,
        batch_stats=donor.variables.get("batch_stats", {}),
    )
    mgr = CheckpointManager(str(tmp_path), "gating", "t")
    mgr.save_epoch(state, 0, 1.0)

    eng = InferenceEngine.from_orbax_checkpoint(
        cfg, str(tmp_path / "gating" / "t" / "best"),
        camera_hw=(120, 160), model_hw=(64, 64), dtype=jnp.float32,
    )
    a = jax.tree.leaves(eng.variables["params"])[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_submit_rejects_mismatched_frames(engine):
    """r3 advisor fix: a frame whose shape differs from engine.camera_hw
    is rejected at submit() — previously two clients with different sizes
    in one batching window killed the worker thread via np.stack and hung
    every later request forever."""
    from automoe_tpu.serving.server import BatchingServer

    with BatchingServer(engine, max_batch=4, max_wait_ms=20) as srv:
        with pytest.raises(ValueError, match="frame shape"):
            srv.submit(np.zeros((8, 8, 3), np.uint8), 0.0)
        # server still healthy for well-formed requests
        out = srv.infer(np.zeros((*CAM_HW, 3), np.uint8), 1.0)
        assert np.isfinite(out["waypoints"]).all()


def test_worker_survives_group_exception(engine):
    """The batching worker contains per-group failures: a poison group
    (mismatched shapes injected directly into the queue, bypassing
    submit validation) resolves its futures with the exception and the
    worker keeps serving."""
    import time as _time
    from concurrent.futures import Future

    from automoe_tpu.serving.server import BatchingServer

    with BatchingServer(engine, max_batch=4, max_wait_ms=30) as srv:
        bad1, bad2 = Future(), Future()
        t = _time.perf_counter()
        srv._q.put((np.zeros((4, 4, 3), np.uint8), 0.0, bad1, t))
        srv._q.put((np.zeros((6, 6, 3), np.uint8), 0.0, bad2, t))
        with pytest.raises(Exception):
            bad1.result(timeout=30)
        with pytest.raises(Exception):
            bad2.result(timeout=30)
        assert srv._worker.is_alive()
        out = srv.infer(np.zeros((*CAM_HW, 3), np.uint8), 2.0)
        assert np.isfinite(out["waypoints"]).all()


def test_stats_snapshot_latency_percentiles(engine):
    """VERDICT r2 #9: the stats op reports p50/p99 queue-wait and device
    latency so the max_wait_ms/bucket tradeoff is measurable live."""
    from automoe_tpu.serving.server import BatchingServer, Client, serve_tcp

    with BatchingServer(engine, max_batch=4, max_wait_ms=20) as batcher:
        for i in range(5):
            batcher.infer(_frames(1, seed=i)[0], float(i))
        snap = batcher.stats_snapshot()
        for key in ("queue_latency_ms_p50", "queue_latency_ms_p99",
                    "device_latency_ms_p50", "device_latency_ms_p99"):
            assert snap[key] is not None and snap[key] >= 0.0
        assert snap["queue_latency_ms_p50"] <= snap["queue_latency_ms_p99"]
        # and over the wire
        tcp = serve_tcp(batcher)
        try:
            c = Client("127.0.0.1", tcp.server_address[1])
            stats = c.stats()["stats"]
            assert stats["device_latency_ms_p50"] is not None
            c.close()
        finally:
            tcp.shutdown()
            tcp.server_close()


def test_header_length_cap(engine):
    """A bogus 4-byte length prefix (up to 4 GiB) must not trigger a
    giant buffered recv — the connection is dropped at the cap."""
    import socket as _socket
    import struct as _struct

    from automoe_tpu.serving.server import BatchingServer, serve_tcp

    with BatchingServer(engine, max_batch=2, max_wait_ms=10) as batcher:
        tcp = serve_tcp(batcher)
        try:
            s = _socket.create_connection(
                ("127.0.0.1", tcp.server_address[1])
            )
            s.sendall(_struct.pack(">I", 0xFFFFFFFF))
            s.settimeout(10)
            # server drops the connection without consuming 4 GiB
            assert s.recv(1) == b""
            s.close()
        finally:
            tcp.shutdown()
            tcp.server_close()


def test_server_desync_and_close_robustness(engine):
    """Protocol robustness (review r2): a bad header can't desync the
    length-prefixed stream (bounded dims, payload consumed before error
    replies), and close() resolves queued futures instead of hanging
    callers."""
    import struct as _struct

    from automoe_tpu.serving.server import (
        BatchingServer, Client, _recv_msg, _send_msg, serve_tcp,
    )

    with BatchingServer(engine, max_batch=2, max_wait_ms=20) as batcher:
        srv = serve_tcp(batcher)
        host, port = srv.server_address[:2]
        try:
            # bogus dims: server replies with an error and DROPS the conn
            # (it cannot know the payload length) instead of reading 3 GB
            import socket as _socket

            s = _socket.create_connection((host, port))
            _send_msg(s, {"height": 10**9, "width": 10**9, "speed_kmh": 0.0})
            out, _ = _recv_msg(s)
            assert "error" in out and "bad frame dims" in out["error"]
            s.close()

            # a real client on a fresh connection still works
            c = Client(host, port)
            frame = np.zeros((*engine.camera_hw, 3), np.uint8)
            out = c.infer(frame, 5.0)
            assert np.isfinite(out["waypoints"]).all()
            c.close()
        finally:
            srv.shutdown()

    # close() with queued work resolves futures with an error
    b2 = BatchingServer(engine, max_batch=2, max_wait_ms=20)
    b2.start()
    b2._stop.set()  # stop the worker from draining
    b2._worker.join(timeout=5)
    b2._worker = True  # keep submit() working for the enqueue below
    fut = None
    try:
        from concurrent.futures import Future

        fut = Future()
        b2._q.put((np.zeros((*engine.camera_hw, 3), np.uint8), 0.0, fut, 0.0))
    finally:
        b2._worker = None
        b2.close()
    with pytest.raises(RuntimeError, match="server closed"):
        fut.result(timeout=5)


def test_pipelined_server_matches_serial(engine):
    """pipeline_depth >= 2 (the serve CLI default) splits the worker into
    dispatch + fetch stages with a bounded in-flight queue; rows must be
    identical to the serial worker's (same engine, same bucket math) and
    every request must resolve."""
    from automoe_tpu.serving.server import BatchingServer

    frames = _frames(12, seed=7)
    speeds = np.arange(12, dtype=np.float32)
    ref = engine.infer_batch(frames, speeds)

    with BatchingServer(engine, max_batch=4, max_wait_ms=20,
                        pipeline_depth=3) as srv:
        assert srv._fetcher is not None  # pipelined worker actually on
        futs = [srv.submit(frames[i], float(speeds[i])) for i in range(12)]
        rows = [f.result(timeout=120) for f in futs]
    assert srv.stats["requests"] == 12
    snap = srv.stats_snapshot()
    assert snap["device_latency_ms_p50"] is not None
    for i, row in enumerate(rows):
        np.testing.assert_allclose(
            row["waypoints"], ref["waypoints"][i], rtol=2e-2, atol=2e-2
        )


def test_pipelined_fetch_error_propagates(engine):
    """An exception in the FETCH stage must resolve that batch's futures
    with the error (not hang callers or kill the fetch thread), and the
    server must keep serving afterwards."""
    from automoe_tpu.serving.server import BatchingServer

    class FlakyFetch:
        """Engine facade whose first fetch raises."""

        def __init__(self, inner):
            self._inner = inner
            self.camera_hw = inner.camera_hw
            self._fail = True

        def infer_batch(self, f, s):
            return self._inner.infer_batch(f, s)

        def dispatch_batch(self, f, s):
            return self._inner.dispatch_batch(f, s)

        def fetch(self, out, real_b):
            if self._fail:
                self._fail = False
                raise RuntimeError("boom")
            return self._inner.fetch(out, real_b)

    flaky = FlakyFetch(engine)
    frame = _frames(1, seed=8)[0]
    with BatchingServer(flaky, max_batch=2, max_wait_ms=10,
                        pipeline_depth=2) as srv:
        with pytest.raises(RuntimeError, match="boom"):
            srv.submit(frame, 1.0).result(timeout=60)
        out = srv.submit(frame, 1.0).result(timeout=60)  # still serving
        assert np.isfinite(out["waypoints"]).all()


def test_pipelined_falls_back_without_dispatch(engine):
    """Engines without dispatch_batch/fetch (e.g. ArtifactEngine) force
    the serial worker even when pipeline_depth > 1 is requested."""
    from automoe_tpu.serving.server import BatchingServer

    class Facade:
        def __init__(self, inner):
            self._inner = inner
            self.camera_hw = inner.camera_hw

        def infer_batch(self, f, s):
            return self._inner.infer_batch(f, s)

    srv = BatchingServer(Facade(engine), max_batch=2, max_wait_ms=10,
                         pipeline_depth=4)
    assert srv.pipeline_depth == 1
    with srv:
        out = srv.infer(_frames(1, seed=9)[0], 2.0)
    assert out["waypoints"].ndim == 2
    assert srv._fetcher is None


def test_open_loop_soak_tool(engine):
    """benchmarks/serving_soak_bench.open_loop_soak drives the real
    BatchingServer with non-blocking arrivals: every submitted request
    completes (or is reported as backlog), latencies are recorded via
    completion callbacks, and the record's accounting is consistent."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from benchmarks.serving_soak_bench import open_loop_soak

    rec = open_loop_soak(engine, rate_rps=40.0, seconds=1.0,
                         max_batch=4, max_wait_ms=5.0, drain_s=20.0)
    assert rec["submitted"] > 0
    assert rec["completed"] + rec["backlog_at_drain_end"] == rec["submitted"]
    assert rec["backlog_at_drain_end"] == 0  # tiny model drains in 20 s
    assert rec["e2e_ms_p50"] is not None and rec["e2e_ms_p50"] > 0
    assert rec["server"]["requests"] == rec["submitted"]


def test_cancelled_future_serial_worker_survives(engine):
    """A client that times out and cancels its PENDING future (the
    standard concurrent.futures pattern) must not poison the worker:
    the group claim (set_running_or_notify_cancel) drops cancelled
    requests before the engine call, and later requests still serve."""
    from automoe_tpu.serving.server import BatchingServer

    gate = threading.Event()
    gate.set()

    class Gated:
        def __init__(self, inner):
            self._inner = inner
            self.camera_hw = inner.camera_hw

        def infer_batch(self, f, s):
            gate.wait(timeout=60)
            return self._inner.infer_batch(f, s)

    frame = _frames(1, seed=11)[0]
    srv = BatchingServer(Gated(engine), max_batch=1, max_wait_ms=2).start()
    try:
        gate.clear()  # next engine call blocks
        fut_a = srv.submit(frame, 1.0)   # worker picks this up and blocks
        time.sleep(0.1)
        fut_b = srv.submit(frame, 2.0)   # stays PENDING in the queue
        assert fut_b.cancel()            # client timeout path
        gate.set()
        assert np.isfinite(fut_a.result(timeout=60)["waypoints"]).all()
        with pytest.raises(Exception):   # CancelledError
            fut_b.result(timeout=1)
        # the worker must still be alive and serving
        out = srv.submit(frame, 3.0).result(timeout=60)
        assert np.isfinite(out["waypoints"]).all()
    finally:
        gate.set()
        srv.close()


def test_cancelled_future_pipelined_fetcher_survives(engine):
    """Same client-cancel pattern in pipelined mode: before the fix, a
    cancelled future reaching the fetch thread's set_result raised
    InvalidStateError, killed the fetcher, stranded _inflight high, and
    deadlocked the worker's backpressure loop for every later client."""
    from automoe_tpu.serving.server import BatchingServer

    gate = threading.Event()
    gate.set()

    class GatedFetch:
        def __init__(self, inner):
            self._inner = inner
            self.camera_hw = inner.camera_hw

        def infer_batch(self, f, s):
            return self._inner.infer_batch(f, s)

        def dispatch_batch(self, f, s):
            return self._inner.dispatch_batch(f, s)

        def fetch(self, out, real_b):
            gate.wait(timeout=60)
            return self._inner.fetch(out, real_b)

    frame = _frames(1, seed=12)[0]
    srv = BatchingServer(GatedFetch(engine), max_batch=1, max_wait_ms=2,
                         pipeline_depth=2).start()
    try:
        assert srv._fetcher is not None
        gate.clear()
        fut_a = srv.submit(frame, 1.0)
        fut_b = srv.submit(frame, 2.0)
        deadline = time.time() + 30
        while srv._in_flight() < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert srv._in_flight() == 2  # pipe full, fetch blocked
        fut_c = srv.submit(frame, 3.0)  # PENDING behind the full pipe
        assert fut_c.cancel()
        gate.set()
        assert np.isfinite(fut_a.result(timeout=60)["waypoints"]).all()
        assert np.isfinite(fut_b.result(timeout=60)["waypoints"]).all()
        with pytest.raises(Exception):
            fut_c.result(timeout=5)
        # fetcher alive, inflight drained, later requests serve
        out = srv.submit(frame, 4.0).result(timeout=60)
        assert np.isfinite(out["waypoints"]).all()
        deadline = time.time() + 10
        while srv._in_flight() > 0 and time.time() < deadline:
            time.sleep(0.01)
        assert srv._in_flight() == 0
        assert srv._fetcher.is_alive()
        snap = srv.stats_snapshot()
        assert snap["fetch_latency_ms_p50"] is not None
    finally:
        gate.set()
        srv.close()
