"""On-chip serving soak: BatchingServer under concurrent clients at the
reference's 20 Hz control regime (VERDICT r3 item 5).

The reference serves one synchronous model call per simulator tick
(inference/run_automoe.py:242-291, fixed 0.05 s tick); this framework
serves many clients through a bucketed batching server
(serving/server.py). This soak drives the REAL server on the REAL chip
and records, per (engine, client-count) cell:

  * achieved request throughput vs offered load (clients x 20 Hz),
  * end-to-end client latency p50/p99 (submit -> result, includes queue
    wait + device step + this environment's ~30-45 ms host<->device RPC
    tunnel — a production host's PCIe path subtracts that constant),
  * the server's own stats op (queue-wait / device-step p50/p99 — the
    new stats_snapshot percentiles),
  * ArtifactEngine cold-start: save_serving_bundle -> ArtifactEngine()
    -> first real result, timed (the deserialize-and-serve path
    serving/export.py gives deployments).

Engines: bf16 (the default serving dtype) and int8 PTQ
(serving/quant.py). Run AFTER any other TPU job finishes — one chip.

Usage: python benchmarks/serving_soak_bench.py [--seconds 30]
    [--clients 1,8,32] [--engines bf16,int8] [--cold-start]
Run in BACKGROUND with a generous timeout; never kill mid-compile
(CLAUDE.md landmine 4).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

HZ = 20.0  # the reference's control-loop rate


def build_engine(kind: str, camera_hw=(600, 800), model_hw=(256, 256)):
    import jax.numpy as jnp

    from automoe_tpu.configs import default_model_config
    from automoe_tpu.infer.engine import InferenceEngine

    return InferenceEngine(
        default_model_config(),
        camera_hw=camera_hw,
        model_hw=model_hw,
        dtype=jnp.bfloat16,
        quantize=(kind == "int8"),
    )


def soak(engine, n_clients: int, seconds: float, *, max_batch: int = 32,
         max_wait_ms: float = 8.0, pipeline_depth: int = 1):
    """n_clients threads each submit at 20 Hz for `seconds`; returns the
    cell's throughput/latency record."""
    from automoe_tpu.serving.server import BatchingServer

    rng = np.random.default_rng(0)
    h, w = engine.camera_hw
    frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    lat, lock = [], threading.Lock()
    stop = threading.Event()

    with BatchingServer(engine, max_batch=max_batch,
                        max_wait_ms=max_wait_ms,
                        pipeline_depth=pipeline_depth) as srv:
        def client(cid: int):
            period = 1.0 / HZ
            # stagger starts so clients don't tick in lockstep
            next_t = time.perf_counter() + (cid % 16) * (period / 16)
            my = []
            while not stop.is_set():
                now = time.perf_counter()
                if now < next_t:
                    time.sleep(min(next_t - now, 0.01))
                    continue
                next_t += period
                t0 = time.perf_counter()
                try:
                    srv.submit(frame, 30.0).result(timeout=10)
                except Exception:
                    break
                my.append(time.perf_counter() - t0)
            with lock:
                lat.extend(my)

        ts = [threading.Thread(target=client, args=(i,))
              for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        time.sleep(seconds)
        stop.set()
        for t in ts:
            t.join(timeout=15)
        wall = time.perf_counter() - t0
        snap = srv.stats_snapshot()

    arr = np.asarray(lat, np.float64) * 1e3
    done = len(arr)
    return {
        "clients": n_clients,
        "offered_rps": round(n_clients * HZ, 1),
        "achieved_rps": round(done / wall, 1),
        "requests": done,
        "e2e_ms_p50": round(float(np.percentile(arr, 50)), 2) if done else None,
        "e2e_ms_p99": round(float(np.percentile(arr, 99)), 2) if done else None,
        "server": {
            k: snap.get(k)
            for k in ("batches", "requests", "rows_padded",
                      "queue_latency_ms_p50", "queue_latency_ms_p99",
                      "device_latency_ms_p50", "device_latency_ms_p99")
        },
    }


def open_loop_soak(engine, rate_rps: float, seconds: float, *,
                   max_batch: int = 32, max_wait_ms: float = 8.0,
                   pipeline_depth: int = 1, drain_s: float = 30.0):
    """OPEN-LOOP arrivals: one generator submits at an aggregate
    `rate_rps` without blocking on results (a fleet front door), so the
    group size is set by arrival rate x max_wait, not by the number of
    outstanding closed-loop clients. This is the regime where
    dispatch/fetch pipelining (`pipeline_depth>=2`) can pay: batch k+1's
    H2D rides the tunnel's upstream while batch k's D2H rides the
    downstream. Latency is submit -> future done (completion-callback
    timestamped); unfinished requests at the end of the drain window are
    reported as backlog, not silently dropped."""
    from automoe_tpu.serving.server import BatchingServer

    rng = np.random.default_rng(0)
    h, w = engine.camera_hw
    frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    lat, lock = [], threading.Lock()

    with BatchingServer(engine, max_batch=max_batch,
                        max_wait_ms=max_wait_ms,
                        pipeline_depth=pipeline_depth) as srv:
        submitted = 0
        period = 1.0 / rate_rps
        t0 = time.perf_counter()
        next_t = t0
        while True:
            now = time.perf_counter()
            if now - t0 >= seconds:
                break
            if now < next_t:
                time.sleep(min(next_t - now, 0.005))
                continue
            next_t += period
            t_sub = time.perf_counter()

            def done_cb(fut, t_sub=t_sub):
                t_done = time.perf_counter()
                if fut.exception() is None:
                    with lock:
                        lat.append(t_done - t_sub)

            srv.submit(frame, 30.0).add_done_callback(done_cb)
            submitted += 1
        gen_wall = time.perf_counter() - t0
        # drain: give outstanding requests a bounded window to finish
        t_drain = time.perf_counter()
        while time.perf_counter() - t_drain < drain_s:
            with lock:
                if len(lat) >= submitted:
                    break
            time.sleep(0.05)
        wall = time.perf_counter() - t0
        snap = srv.stats_snapshot()

    with lock:
        arr = np.asarray(lat, np.float64) * 1e3
    done = len(arr)
    return {
        "open_loop_rps": rate_rps,
        "submitted": submitted,
        "completed": done,
        "backlog_at_drain_end": submitted - done,
        "achieved_rps": round(done / wall, 1),
        "achieved_rps_gen_window": round(done / gen_wall, 1) if done else 0.0,
        "e2e_ms_p50": round(float(np.percentile(arr, 50)), 2) if done else None,
        "e2e_ms_p99": round(float(np.percentile(arr, 99)), 2) if done else None,
        "server": {
            k: snap.get(k)
            for k in ("batches", "requests", "rows_padded",
                      "queue_latency_ms_p50", "queue_latency_ms_p99",
                      "device_latency_ms_p50", "device_latency_ms_p99")
        },
    }


def _time_artifact_cold_start(bundle: Path):
    """fresh ArtifactEngine over an existing bundle -> first result."""
    from automoe_tpu.serving.export import ArtifactEngine

    t1 = time.perf_counter()
    ae = ArtifactEngine(bundle)
    h, w = ae.camera_hw
    out = ae.infer_batch(np.zeros((1, h, w, 3), np.uint8), np.zeros((1,)))
    np.asarray(next(iter(out.values())))
    return round(time.perf_counter() - t1, 2)


def cold_start(engine, tmp: Path):
    """save bundle -> fresh ArtifactEngine -> first result, timed."""
    from automoe_tpu.serving.export import save_serving_bundle

    bundle = tmp / "bundle"
    t0 = time.perf_counter()
    save_serving_bundle(engine, bundle, buckets=(1, 8))
    t_save = time.perf_counter() - t0
    return {"bundle_save_s": round(t_save, 2),
            "cold_start_to_first_result_s": _time_artifact_cold_start(bundle)}


def tunnel_probe(camera_hw=(600, 800)):
    """Measure THIS environment's host<->device path so the soak cells
    can be attributed: on axon every dispatch/fetch rides a remote
    tunnel (~tens of ms RTT, ~50 MB/s), so a 1.44 MB camera frame pays
    a transfer floor a production host's PCIe path would not. Reports
    the fetch RTT (median of small-scalar fetches) and the effective
    H2D MB/s (uploading one frame batch, forced by a dependent scalar
    fetch — `block_until_ready` acks early on this stack, CLAUDE.md
    landmine 2), plus the derived per-request floor at batch 1."""
    import jax
    import jax.numpy as jnp

    tiny = jnp.zeros(())
    np.asarray(tiny)  # first-fetch warmup
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(tiny + 0.0)
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtts)) * 1e3

    h, w = camera_hw
    frame = np.random.default_rng(0).integers(
        0, 256, (1, h, w, 3), dtype=np.uint8
    )
    reduce_fn = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    np.asarray(reduce_fn(jnp.asarray(frame)))  # warm the reducer
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        dx = jax.device_put(frame)
        np.asarray(reduce_fn(dx))  # D2H scalar forces the upload done
        ts.append(time.perf_counter() - t0)
    up_s = max(float(np.median(ts)) - rtt_ms / 1e3, 1e-6)
    mb = frame.nbytes / 2**20
    return {
        "rpc_fetch_rtt_ms": round(rtt_ms, 1),
        "h2d_MB_per_s": round(mb / up_s, 1),
        "frame_MB": round(mb, 2),
        "batch1_tunnel_floor_ms": round(rtt_ms + up_s * 1e3, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--clients", default="1,8,32")
    p.add_argument("--engines", default="bf16,int8")
    p.add_argument("--open-loop", default=None,
                   help="comma list of aggregate arrival rates (rps), "
                        "e.g. '12,24,48': replaces the closed-loop "
                        "client cells with OPEN-LOOP arrivals (fleet "
                        "front door — submits don't block on results). "
                        "The regime where --pipeline-depth>=2 can pay")
    p.add_argument("--cold-start", action="store_true")
    p.add_argument("--cold-start-only", action="store_true",
                   help="skip the soak: build/save the bundle if "
                        f"missing under --tmp, then time "
                        "ArtifactEngine -> first result in THIS "
                        "process. Run the script TWICE to split the "
                        "cold start into compile (run 1, persistent "
                        "compile cache cold) vs load (run 2, cache "
                        "warm) — run 2 is what a serving-host restart "
                        "pays")
    p.add_argument("--pipeline-depth", default="1",
                   help="comma list, e.g. '1,2': each (engine, clients) "
                        "cell runs once per depth BACK-TO-BACK so serial "
                        "vs pipelined share tunnel conditions (the "
                        "shared relay's bandwidth swings 7x between "
                        "runs); 1 = serial worker (default — measured "
                        "better under closed-loop clients, see "
                        "BENCHMARKS.md), >=2 = dispatch/fetch "
                        "pipelining for open-loop/compute-bound hosts")
    p.add_argument("--tmp", default="/tmp/serving_soak")
    p.add_argument("--cpu", action="store_true",
                   help="loopback soak against a CPU-backend engine: no "
                        "tunnel, no TPU — bounds the SERVER'S OWN "
                        "host-side overhead (group formation, future "
                        "fan-out, queue discipline) separately from "
                        "transport+device. The production-host "
                        "extrapolation becomes two-sided: axon cells "
                        "bound transport-dominated behavior, this cell "
                        "bounds framework overhead")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from benchmarks.watchdog import init_watchdog

    dev = init_watchdog()[0]  # backend init under the wedge timer
    from automoe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    if args.cold_start_only:
        bundle = Path(args.tmp) / "bundle"
        rec = {"device": str(dev), "bundle": str(bundle),
               "bundle_reused": (bundle / "meta.json").exists()}
        if not rec["bundle_reused"]:
            from automoe_tpu.serving.export import save_serving_bundle

            t0 = time.perf_counter()
            save_serving_bundle(build_engine("bf16"), bundle, buckets=(1, 8))
            rec["bundle_save_s"] = round(time.perf_counter() - t0, 2)
        rec["cold_start_to_first_result_s"] = _time_artifact_cold_start(bundle)
        print(json.dumps(rec), flush=True)
        return

    # --cpu loopback: a small engine keeps the CPU device step in the
    # few-ms range so the 30 s cell completes hundreds of requests and
    # queue-wait/device percentiles resolve the SERVER overhead
    eng_kw = (dict(camera_hw=(120, 160), model_hw=(64, 64))
              if args.cpu else {})
    out = {"device": str(dev), "hz": HZ, "seconds": args.seconds,
           "loopback_cpu": bool(args.cpu),
           "tunnel": None if args.cpu else tunnel_probe()}
    if out["tunnel"]:
        print(json.dumps({"tunnel": out["tunnel"]}), flush=True)
    for kind in args.engines.split(","):
        engine = build_engine(kind, **eng_kw)
        cells = []
        depths = [int(d) for d in str(args.pipeline_depth).split(",")]
        if args.open_loop:
            for rate in (float(r) for r in args.open_loop.split(",")):
                for depth in depths:
                    cell = open_loop_soak(
                        engine, rate, args.seconds, pipeline_depth=depth
                    )
                    cell["pipeline_depth"] = depth
                    cells.append(cell)
                    print(json.dumps({kind: cell}), flush=True)
        else:
            for n in (int(c) for c in args.clients.split(",")):
                for depth in depths:
                    cell = soak(engine, n, args.seconds, pipeline_depth=depth)
                    cell["pipeline_depth"] = depth
                    cells.append(cell)
                    print(json.dumps({kind: cell}), flush=True)
        out[kind] = cells
        if args.cold_start and kind == "bf16":
            out["cold_start_bf16"] = cold_start(engine, Path(args.tmp))
            print(json.dumps({"cold_start_bf16": out["cold_start_bf16"]}),
                  flush=True)
        del engine
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
