"""`automoe-serve`: TCP micro-batching model server.

Serves the AutoMoE control outputs over the length-prefixed TCP protocol
(serving/server.py; `serving.Client` is the reference client). Three ways
to get a model, in order of production-readiness:

  automoe-serve --bundle exported_bundle/          # cold start: compiled
                                                   # StableHLO artifacts only
  automoe-serve --checkpoint checkpoints/gating/run/best   # orbax dir
  automoe-serve --checkpoint automoe.pth           # reference torch ckpt
  automoe-serve                                    # random init (smoke)

The reference's only serving story is the closed-loop CARLA runner
(inference/run_automoe.py) — it has no request server.
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Optional, Sequence


def build_engine(args):
    import jax.numpy as jnp

    if args.bundle:
        if args.ema:
            raise SystemExit(
                "--ema applies at export time for bundles: pass "
                "prefer_ema when building the bundle's engine instead"
            )
        if args.data_parallel:
            raise SystemExit(
                "--data-parallel needs a live model (the bundle's "
                "StableHLO artifacts are compiled single-chip) — use "
                "--checkpoint/--model-config"
            )
        from automoe_tpu.serving.export import ArtifactEngine

        return ArtifactEngine(args.bundle)

    from automoe_tpu.configs import default_model_config
    from automoe_tpu.infer.engine import InferenceEngine

    cfg = args.model_config or default_model_config()
    kw = dict(
        camera_hw=tuple(args.camera_hw),
        model_hw=tuple(args.model_hw),
        dtype=jnp.bfloat16 if not args.fp32 else jnp.float32,
        quantize=args.quantize,
    )
    if args.data_parallel:
        from automoe_tpu.parallel import MeshSpec, make_mesh

        kw["mesh"] = make_mesh(MeshSpec(data=-1, model=1))
    if args.checkpoint and args.checkpoint.endswith(".pth"):
        if args.ema:
            raise SystemExit("--ema needs an orbax checkpoint written by "
                             "a --ema-decay training run (not a .pth)")
        return InferenceEngine.from_torch_checkpoint(cfg, args.checkpoint, **kw)
    if args.checkpoint:
        quantize = kw.pop("quantize")
        return InferenceEngine.from_orbax_checkpoint(
            cfg, args.checkpoint, quantize=quantize, prefer_ema=args.ema, **kw
        )
    if args.ema:
        raise SystemExit("--ema needs --checkpoint")
    return InferenceEngine(cfg, **kw)


def main(argv: Optional[Sequence[str]] = None, block: bool = True):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--bundle", default=None,
                   help="save_serving_bundle dir — serve compiled "
                        "artifacts, no model code or compile at startup")
    p.add_argument("--model-config", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir or reference .pth")
    p.add_argument("--quantize", action="store_true",
                   help="int8 PTQ expert trunks (serving/quant.py)")
    p.add_argument("--ema", action="store_true",
                   help="serve the EMA weights from a --ema-decay run's "
                        "orbax checkpoint (the deploy-side weights)")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--camera-hw", type=int, nargs=2, default=(600, 800))
    p.add_argument("--model-hw", type=int, nargs=2, default=(256, 256))
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--pipeline-depth", type=int, default=1,
                   help=">=2 overlaps the next batch's H2D/dispatch "
                        "with the current batch's device step + D2H "
                        "(bounded in-flight queue); 1 = serial worker "
                        "(default: with CLOSED-LOOP clients — each "
                        "blocking on its result, the reference's 20 Hz "
                        "regime — depth 2 splits the outstanding-"
                        "request population into smaller padded "
                        "batches, measured 2x WORSE on a transfer-"
                        "bound path; see BENCHMARKS.md serving soak. "
                        "Use >=2 for open-loop traffic on hosts where "
                        "device compute is comparable to H2D). Engines "
                        "without dispatch_batch (--bundle) fall back "
                        "to serial")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard serving batches over ALL devices (a "
                        "'data' mesh): params replicate, each request "
                        "batch splits across chips — linear scale-out "
                        "for batch serving. Sub-multiple batches are "
                        "repeat-padded inside the engine; size --max-"
                        "batch to a multiple of the device count")
    args = p.parse_args(argv)

    from automoe_tpu.serving.server import BatchingServer, serve_tcp
    from automoe_tpu.utils import enable_compile_cache

    # Persistent compile cache: a restart of this serving host re-lowers
    # the same programs (engine jit, or the bundle's deserialize+call),
    # and the cache turns that recompile into a load (measured on chip:
    # BENCHMARKS.md serving-soak cold-start split).
    enable_compile_cache()
    engine = build_engine(args)
    buckets = getattr(engine, "buckets", None)  # ArtifactEngine pins them
    max_batch = (
        min(args.max_batch, max(buckets)) if buckets else args.max_batch
    )
    batcher = BatchingServer(
        engine, max_batch=max_batch, max_wait_ms=args.max_wait_ms,
        buckets=buckets, pipeline_depth=args.pipeline_depth,
    ).start()
    srv = serve_tcp(batcher, host=args.host, port=args.port)
    host, port = srv.server_address[:2]
    print(json.dumps({"serving": True, "host": host, "port": port,
                      "max_batch": batcher.max_batch,
                      "buckets": batcher.buckets}), flush=True)
    if not block:
        return srv, batcher
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
