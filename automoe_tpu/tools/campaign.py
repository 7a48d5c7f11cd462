"""The reference's staged program, end-to-end on device, with checkpoint
handoff across every pipeline boundary (VERDICT r4 item 1).

The reference product is a 7-stage chain of bash launchers (README.md:
48-62): collect -> preprocess -> BDD expert training -> CARLA fine-tune
-> policy -> gating (loading the fine-tuned expert checkpoints,
training/train_gating_network.sh:27-33) -> closed-loop inference. Each
stage's OUTPUT is the next stage's INPUT. `tests/test_pipeline_smoke.py`
proves that spine on CPU fixtures; this runner executes it at
reduced-but-honest scale (256² frames, real loaders, real Trainer,
real eval CLI, real export/quant/serving stack) in ONE process on the
real chip, and ledgers per-stage wall-clock + key metrics to
<out>/campaign.json.

Stages (each timed; checkpoint arrows are actual file handoffs):
  data      synth raw CARLA episodes -> REAL preprocess_carla (L0->L1);
            synth BDD caches (the datasets themselves are not
            downloadable here — tools/synth.py writes the reference's
            formats with learnable structure)
  experts   bdd detection/drivable/segmentation   (T2)
  finetune  carla det/seg/drv  [--warm-start: --init-from experts best]
            + nuscenes-2d                         (T4, T5)
  policy    standalone trajectory policy          (T6)
  gating    --expert-ckpts <4 finetune bests> --cache-expert-features
            [--device-resident]                   (T7 production config)
  eval      evals gating CLI over the trained gating best + curves (E3)
  export    save_serving_bundle (bf16) + int8 PTQ calibrated on real
            val frames, engine parity probe
  serve     BatchingServer soak on the TRAINED engine @ 20 Hz clients
            + closed-loop MockSim with the trained weights (I1)

Usage (chip):   python -m automoe_tpu.tools.campaign --out runs/campaign_r5
Smoke (CPU):    python -m automoe_tpu.tools.campaign --smoke --out /tmp/camp
Run in BACKGROUND with a generous window; never kill mid-compile
(CLAUDE.md landmine 4).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
import traceback
from pathlib import Path
from typing import Dict, List


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


class Ledger:
    def __init__(self, out: Path):
        self.path = out / "campaign.json"
        # resume semantics: --skip re-runs load the existing ledger so
        # skipped stages keep their rows and re-run stages overwrite
        # theirs in place (the final file is always the full chain)
        if self.path.exists():
            self.rec: Dict = json.loads(self.path.read_text())
        else:
            self.rec = {"stages": {}, "order": []}

    def stage(self, name: str, result: Dict, wall_s: float):
        self.rec["stages"][name] = {
            "wall_s": round(wall_s, 1),
            **{k: _jsonable(v) for k, v in result.items()},
        }
        if name not in self.rec["order"]:
            self.rec["order"].append(name)
        self.path.write_text(json.dumps(self.rec, indent=1))
        print(f"[campaign] <<< {name} done in {wall_s:.1f}s: "
              f"{json.dumps({k: _jsonable(v) for k, v in result.items()})[:400]}",
              flush=True)


def _train(argv: List[str]) -> Dict:
    from automoe_tpu.train.cli import main as train_main

    print(f"[campaign] train {' '.join(argv)}", flush=True)
    res = train_main(argv) or {}
    return {k: _jsonable(v) for k, v in res.items()}


def model_config_dict() -> Dict:
    from automoe_tpu.configs import default_model_config

    return dataclasses.asdict(default_model_config())


def main(argv=None):
    p = argparse.ArgumentParser("automoe-campaign")
    p.add_argument("--out", default="runs/campaign")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--bdd-train", type=int, default=256)
    p.add_argument("--bdd-val", type=int, default=32)
    p.add_argument("--carla-runs", type=int, default=5)
    p.add_argument("--carla-frames", type=int, default=64)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--epochs-experts", type=int, default=2)
    p.add_argument("--epochs-finetune", type=int, default=2)
    p.add_argument("--epochs-policy", type=int, default=3)
    p.add_argument("--epochs-gating", type=int, default=4)
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="scan-group K for the gating stage")
    p.add_argument("--device-resident", action="store_true",
                   help="gating trains from the HBM-resident cached "
                        "working set (needs the feature cache; on by "
                        "default on TPU via --steps-per-call>1)")
    p.add_argument("--no-warm-start", action="store_true",
                   help="fine-tune from scratch init like the reference "
                        "(ImageNet weights are not loadable here) instead "
                        "of from the BDD expert checkpoints")
    p.add_argument("--skip", default="",
                   help="comma-separated stage names to skip (their "
                        "artifacts must already exist under --out)")
    p.add_argument("--serve-seconds", type=float, default=12.0)
    p.add_argument("--serve-clients", type=int, default=8)
    p.add_argument("--loop-steps", type=int, default=20)
    p.add_argument("--smoke", action="store_true",
                   help="CPU plumbing check: 64² images, tiny counts")
    args = p.parse_args(argv)

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.image_size = 64
        args.batch_size = 4
        args.bdd_train, args.bdd_val = 8, 4
        args.carla_runs, args.carla_frames = 2, 12
        args.horizon = 4
        args.epochs_experts = args.epochs_finetune = 1
        args.epochs_policy = args.epochs_gating = 1
        args.serve_seconds = 2.0
        args.serve_clients = 2
        args.loop_steps = 4

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    skip = set(filter(None, args.skip.split(",")))
    ledger = Ledger(out)
    S = args.image_size
    ckpt_root = str(out / "ckpt")
    runs_root = str(out / "runs")
    bdd_root = out / "data" / "bdd"
    raw_root = out / "data" / "carla_raw"
    pre_root = out / "data" / "carla_pre"

    from benchmarks.watchdog import init_watchdog  # repo root on sys.path

    dev = init_watchdog()
    print(f"[campaign] devices: {dev}", flush=True)
    from automoe_tpu.utils import enable_compile_cache

    enable_compile_cache()

    common = [
        "--batch-size", str(args.batch_size),
        "--num-workers", str(args.num_workers),
        "--image-size", str(S),
        "--ckpt-root", ckpt_root, "--runs-root", runs_root,
    ]

    # config file shared by gating training, eval, and serving
    cfg_path = out / "model_config.json"
    mc = model_config_dict()
    cfg_path.write_text(json.dumps(mc, indent=1))

    # ---------------- data ----------------
    if "data" not in skip:
        t0 = time.time()
        import automoe_tpu.tools.preprocess_carla as prep
        from automoe_tpu.tools.synth import synth_bdd, synth_raw_carla

        if args.smoke:
            prep.OUT_SIZE = S  # keep CPU compile sane (test_pipeline_smoke)
        n_bdd = {"train": args.bdd_train, "val": args.bdd_val}
        for task in ("detection", "segmentation", "drivable"):
            synth_bdd(bdd_root, task=task, n_per_split=n_bdd, size=S)
        runs = tuple(f"run_{i + 1:03d}" for i in range(args.carla_runs))
        synth_raw_carla(raw_root, runs=runs, n_frames=args.carla_frames)
        prep.main(["--raw_dir", str(raw_root), "--out_dir", str(pre_root)])
        n_train_runs = len(list((pre_root / "train").iterdir()))
        n_val_runs = len(list((pre_root / "val").iterdir()))
        ledger.stage("data", {
            "bdd_per_task": n_bdd, "carla_runs": len(runs),
            "carla_frames_per_run": args.carla_frames,
            "pre_train_runs": n_train_runs, "pre_val_runs": n_val_runs,
            "image_size": S,
        }, time.time() - t0)

    # ---------------- experts (BDD) ----------------
    expert_tasks = ("detection", "drivable", "segmentation")
    if "experts" not in skip:
        t0 = time.time()
        res = {}
        for task in expert_tasks:
            t1 = time.time()
            r = _train([
                "bdd", "--task", task,
                "--data-root", str(bdd_root / task),
                "--epochs", str(args.epochs_experts),
                "--run-name", "campaign_bdd", *common,
            ])
            res[task] = {"best_val_loss": r.get("best_val_loss"),
                         "wall_s": round(time.time() - t1, 1)}
        ledger.stage("experts", res, time.time() - t0)

    # ---------------- CARLA fine-tune ----------------
    ft_tasks = ("detection", "segmentation", "drivable")
    if "finetune" not in skip:
        t0 = time.time()
        res = {}
        for task in ft_tasks:
            t1 = time.time()
            cmd = [
                "finetune-carla", "--task", task,
                "--data-root", str(pre_root),
                "--epochs", str(args.epochs_finetune),
                "--run-name", "campaign_ft", *common,
            ]
            if not args.no_warm_start:
                cmd += ["--init-from",
                        f"{ckpt_root}/bdd_{task}/campaign_bdd/best"]
            r = _train(cmd)
            res[task] = {"best_val_loss": r.get("best_val_loss"),
                         "warm_start": not args.no_warm_start,
                         "wall_s": round(time.time() - t1, 1)}
        t1 = time.time()
        r = _train([
            "nuscenes-2d", "--data-root", str(pre_root),
            "--epochs", str(args.epochs_finetune),
            "--run-name", "campaign_ft", *common,
        ])
        res["nuscenes_2d"] = {"best_val_loss": r.get("best_val_loss"),
                              "wall_s": round(time.time() - t1, 1)}
        ledger.stage("finetune", res, time.time() - t0)

    # ---------------- policy ----------------
    if "policy" not in skip:
        t0 = time.time()
        r = _train([
            "policy", "--data-root", str(pre_root),
            "--epochs", str(args.epochs_policy),
            "--horizon", str(args.horizon),
            "--run-name", "campaign", *common,
        ])
        ledger.stage("policy", {"best_val_loss": r.get("best_val_loss")},
                     time.time() - t0)

    # ---------------- gating (checkpoint handoff) ----------------
    expert_ckpts = ",".join([
        f"{ckpt_root}/bdd_detection/campaign_ft/best",
        f"{ckpt_root}/bdd_segmentation/campaign_ft/best",
        f"{ckpt_root}/bdd_drivable/campaign_ft/best",
        f"{ckpt_root}/carla_nuscenes_2d/campaign_ft/best",
    ])
    gating_best = f"{ckpt_root}/gating/campaign/best"
    if "gating" not in skip:
        t0 = time.time()
        cmd = [
            "gating", "--data-root", str(pre_root),
            "--model-config", str(cfg_path),
            "--expert-ckpts", expert_ckpts,
            "--cache-expert-features",
            "--feature-cache-dir", str(out / "feature_cache"),
            "--epochs", str(args.epochs_gating),
            "--run-name", "campaign", *common,
        ]
        if args.steps_per_call > 1:
            cmd += ["--steps-per-call", str(args.steps_per_call)]
        if args.device_resident:
            cmd += ["--device-resident"]
        r = _train(cmd)
        ledger.stage("gating", {
            "best_val_loss": r.get("best_val_loss"),
            "expert_ckpts": expert_ckpts.split(","),
            "device_resident": args.device_resident,
        }, time.time() - t0)

    # ---------------- eval ----------------
    if "eval" not in skip:
        t0 = time.time()
        from automoe_tpu.evals.cli import main as eval_main

        res = eval_main([
            "gating", "--model-config", str(cfg_path),
            "--checkpoint", gating_best,
            "--data-root", str(pre_root), "--split", "val",
            "--batch-size", str(args.batch_size),
            "--num-workers", "1",
            "--image-size", str(S),
            "--out-dir", str(out / "eval_out"),
        ])
        eval_main([
            "training-curves", "--run-dir", f"{runs_root}/gating_campaign",
        ])
        keep = {k: round(float(v), 4) for k, v in res.items()
                if isinstance(v, (int, float))}
        ledger.stage("eval", keep, time.time() - t0)

    # ---------------- export + int8 PTQ ----------------
    bundle_dir = out / "bundle"
    if "export" not in skip:
        t0 = time.time()
        import jax.numpy as jnp
        import numpy as np

        from automoe_tpu.infer.engine import InferenceEngine
        from automoe_tpu.serving.export import save_serving_bundle

        # calibration frames: REAL val frames from the preprocessed set
        from automoe_tpu.data import get_carla_sequence_loader

        val_loader = get_carla_sequence_loader(
            split="val", root_dir=str(pre_root), batch_size=2,
            num_workers=1, shuffle=False, horizon=args.horizon,
        )
        vb = next(iter(val_loader))
        # loader yields normalized model-size images; the engine
        # calibrates on raw camera frames — synthesize u8 frames from
        # the [0,1]-ish images by rescaling (honest distribution)
        img = np.asarray(vb["image"])
        u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        camera_hw = (600, 800) if not args.smoke else (120, 160)
        from PIL import Image

        calib = np.stack([
            np.array(Image.fromarray(f).resize((camera_hw[1], camera_hw[0])))
            for f in u8
        ])
        engine = InferenceEngine.from_orbax_checkpoint(
            str(cfg_path), gating_best, camera_hw=camera_hw,
            model_hw=(S, S), dtype=jnp.bfloat16,
        )
        t_b = time.time()
        save_serving_bundle(engine, bundle_dir, buckets=(1, 8))
        bundle_s = time.time() - t_b
        t_q = time.time()
        engine_q = InferenceEngine.from_orbax_checkpoint(
            str(cfg_path), gating_best, camera_hw=camera_hw,
            model_hw=(S, S), dtype=jnp.bfloat16, quantize=True,
            calib_frames=calib,
        )
        quant_s = time.time() - t_q
        # parity probe between bf16 and int8 on one real frame: model
        # outputs (waypoints / target speed) plus the derived steer
        # command (controllers are deterministic given outputs)
        from automoe_tpu.infer.controllers import pure_pursuit_steer

        f0 = calib[:1]
        o_bf = engine.infer(f0, 30.0)
        o_q = engine_q.infer(f0, 30.0)
        dev_abs = {
            k: round(float(np.max(np.abs(
                np.asarray(o_bf[k], np.float32)
                - np.asarray(o_q[k], np.float32)
            ))), 4)
            for k in ("waypoints", "speed")
        }
        dev_abs["steer_cmd"] = round(abs(
            pure_pursuit_steer(np.asarray(o_bf["waypoints"][0]))
            - pure_pursuit_steer(np.asarray(o_q["waypoints"][0]))
        ), 4)
        ledger.stage("export", {
            "bundle_save_s": round(bundle_s, 1),
            "int8_calibrate_s": round(quant_s, 1),
            "int8_vs_bf16_max_abs_controls": dev_abs,
            "bundle_dir": str(bundle_dir),
        }, time.time() - t0)
        del engine_q

    # ---------------- serve ----------------
    if "serve" not in skip:
        t0 = time.time()
        import threading

        import numpy as np

        from automoe_tpu.serving.server import BatchingServer

        import jax.numpy as jnp

        from automoe_tpu.infer.engine import InferenceEngine

        camera_hw = (600, 800) if not args.smoke else (120, 160)
        engine = InferenceEngine.from_orbax_checkpoint(
            str(cfg_path), gating_best, camera_hw=camera_hw,
            model_hw=(S, S), dtype=jnp.bfloat16,
        )
        engine.warmup()
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (*camera_hw, 3), dtype=np.uint8)
        lat, lock = [], threading.Lock()
        stop = threading.Event()
        with BatchingServer(engine, max_batch=32, max_wait_ms=8.0) as srv:
            def client(cid):
                my = []
                period = 1.0 / 20.0
                next_t = time.perf_counter() + cid * period / 16
                while not stop.is_set():
                    now = time.perf_counter()
                    if now < next_t:
                        time.sleep(min(next_t - now, 0.01))
                        continue
                    next_t += period
                    t1 = time.perf_counter()
                    try:
                        srv.submit(frame, 30.0).result(timeout=20)
                    except Exception:
                        break
                    my.append(time.perf_counter() - t1)
                with lock:
                    lat.extend(my)

            ts = [threading.Thread(target=client, args=(i,))
                  for i in range(args.serve_clients)]
            tw = time.perf_counter()
            for t in ts:
                t.start()
            time.sleep(args.serve_seconds)
            stop.set()
            for t in ts:
                t.join(timeout=25)
            wall = time.perf_counter() - tw
            snap = srv.stats_snapshot()
        arr = np.asarray(lat, np.float64) * 1e3
        serve_rec = {
            "clients": args.serve_clients,
            "achieved_rps": round(len(arr) / wall, 1),
            "e2e_ms_p50": (round(float(np.percentile(arr, 50)), 1)
                           if len(arr) else None),
            "batches": snap.get("batches"),
            "rows_padded": snap.get("rows_padded"),
        }

        # closed loop on MockSim with the TRAINED weights (I1)
        from automoe_tpu.infer.run_automoe import run_closed_loop
        from automoe_tpu.infer.sim import MockSim

        sim = MockSim(fixed_dt=0.05, camera_hw=camera_hw)
        logs = run_closed_loop(
            engine, sim, steps=args.loop_steps,
            out_dir=str(out / "loop"),
        )
        finite = all(
            np.isfinite([l["steer"], l["throttle"], l["brake"]]).all()
            for l in logs
        )
        serve_rec["closed_loop_steps"] = len(logs)
        serve_rec["closed_loop_finite"] = bool(finite)
        ledger.stage("serve", serve_rec, time.time() - t0)

    total = sum(s["wall_s"] for s in ledger.rec["stages"].values())
    ledger.rec["total_wall_s"] = round(total, 1)
    ledger.path.write_text(json.dumps(ledger.rec, indent=1))
    print(f"[campaign] COMPLETE: {len(ledger.rec['stages'])} stages, "
          f"{total:.0f}s total -> {ledger.path}", flush=True)
    return ledger.rec


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
