"""Closed-loop AutoMoE runner (parity with reference inference/
run_automoe.py:159-390): per-tick camera → jitted TPU step → pure-pursuit
steering + PID throttle + proportional brake → sim control, with JSON step
logging, optional frame dumps and GIF export.

Backends: CARLA when the `carla` client is importable (synchronous mode,
fixed dt), otherwise the built-in kinematic MockSim so the loop runs in CI.
"""
from __future__ import annotations

import argparse
import json
import math
import time
from pathlib import Path
from typing import Optional

import numpy as np

from automoe_tpu.infer.controllers import (
    PID,
    brake_command,
    pure_pursuit_steer,
    to_finite_float,
)
from automoe_tpu.infer.engine import InferenceEngine
from automoe_tpu.infer.sim import MockSim


def CarlaSim(**kw):  # lazy import: needs the carla client wheel
    from automoe_tpu.infer.carla_sim import CarlaSim as _C

    return _C(**kw)


def run_closed_loop(
    engine: InferenceEngine,
    sim,
    *,
    steps: int = 2000,
    fixed_dt: float = 0.05,
    lookahead_m: float = 3.0,
    default_start_kmh: float = 20.0,
    bootstrap_steps: int = 20,
    kp: float = 0.4,
    ki: float = 0.0,
    kd: float = 0.02,
    out_dir: Optional[str] = None,
    save_frames: bool = False,
    record_every: int = 1,
):
    # defaults mirror the reference loop exactly (run_automoe.py:166-183:
    # 2000 steps, start 20 km/h, 20 bootstrap steps, PID 0.4/0.0/0.02,
    # record_every 1)
    speed_pid = PID(kp=kp, ki=ki, kd=kd)
    logs = []
    frames_dir = None
    if out_dir:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        if save_frames:
            frames_dir = out / "frames"
            frames_dir.mkdir(exist_ok=True)

    engine.warmup()
    last_speed_kmh = 0.0
    for step in range(steps):
        sim.tick()
        rgb = sim.camera_frame()

        t0 = time.perf_counter()
        pred = engine.infer(rgb, last_speed_kmh)
        infer_ms = (time.perf_counter() - t0) * 1e3

        waypoints = pred["waypoints"][0]  # [H,2] ego frame
        if waypoints.size == 0 or not np.isfinite(waypoints).all():
            steer = 0.0
        else:
            steer = pure_pursuit_steer(waypoints, lookahead_m=lookahead_m)

        target_kmh = float(pred["speed"].reshape(-1)[-1])
        if not math.isfinite(target_kmh):
            target_kmh = (
                default_start_kmh if step < bootstrap_steps else last_speed_kmh
            )
        curr_kmh = float(sim.speed_kmh)
        last_speed_kmh = curr_kmh

        err_kmh = max(0.0, target_kmh) - curr_kmh
        throttle = speed_pid.step(err_kmh, fixed_dt)
        # stiction bootstrap (run_automoe.py:267-280)
        if step < bootstrap_steps and curr_kmh < 1.0 and throttle < 0.2:
            throttle = max(throttle, 0.3)
        steer = to_finite_float(steer)
        throttle = to_finite_float(throttle)
        brake = brake_command(err_kmh)
        sim.apply_control(throttle=throttle, steer=steer, brake=brake)

        logs.append(
            {
                "step": step,
                "speed_kmh": curr_kmh,
                "target_kmh": target_kmh,
                "steer": steer,
                "throttle": throttle,
                "brake": brake,
                "infer_ms": infer_ms,
                "expert_weights": pred["expert_weights"][0].tolist(),
            }
        )
        if frames_dir is not None and step % record_every == 0:
            from PIL import Image

            Image.fromarray(rgb).save(
                frames_dir / f"frame_{step:06d}.jpg", quality=90
            )

    if out_dir:
        (Path(out_dir) / "log.json").write_text(json.dumps(logs, indent=2))
    return logs


def export_gif(frames_dir: str, gif_path: str, every: int = 1) -> None:
    from PIL import Image

    frames = sorted(Path(frames_dir).glob("frame_*.jpg"))[::every]
    if not frames:
        return
    imgs = [Image.open(f) for f in frames]
    imgs[0].save(
        gif_path, save_all=True, append_images=imgs[1:], duration=100, loop=0
    )


def _carla_available() -> bool:
    try:
        import carla  # noqa: F401

        return True
    except ImportError:
        return False


def main(argv=None):
    p = argparse.ArgumentParser(description="Closed-loop AutoMoE on TPU")
    p.add_argument("--model-config", default=None)
    p.add_argument("--checkpoint", default=None, help="reference .pth or orbax dir")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--fixed-dt", type=float, default=0.05)
    p.add_argument("--lookahead-m", type=float, default=3.0)
    p.add_argument("--default-start-kmh", type=float, default=20.0,
                   help="fallback target speed during bootstrap / when "
                        "the model speed is unavailable")
    p.add_argument("--bootstrap-steps", type=int, default=20)
    p.add_argument("--kp", type=float, default=0.4)
    p.add_argument("--ki", type=float, default=0.0)
    p.add_argument("--kd", type=float, default=0.02)
    p.add_argument("--out-dir", default="infer_out")
    p.add_argument("--save-frames", action="store_true")
    p.add_argument("--record-every", type=int, default=1,
                   help="save every Nth frame (reference --record_every)")
    p.add_argument("--export-gif", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="int8 PTQ expert trunks (serving/quant.py)")
    p.add_argument("--ema", action="store_true",
                   help="use the EMA weights from a --ema-decay run's "
                        "orbax checkpoint")
    p.add_argument("--backend", choices=["auto", "mock", "carla"], default="auto")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=2000)
    p.add_argument("--town", default=None)
    args = p.parse_args(argv)

    from automoe_tpu.configs import default_model_config

    cfg = args.model_config or default_model_config()
    kw = {"quantize": args.quantize}
    if args.ema and (not args.checkpoint or args.checkpoint.endswith(".pth")):
        raise SystemExit("--ema needs an orbax checkpoint written by a "
                         "--ema-decay training run")
    if args.checkpoint and args.checkpoint.endswith(".pth"):
        engine = InferenceEngine.from_torch_checkpoint(cfg, args.checkpoint, **kw)
    elif args.checkpoint:  # orbax dir written by the trainer
        engine = InferenceEngine.from_orbax_checkpoint(
            cfg, args.checkpoint, prefer_ema=args.ema, **kw
        )
    else:
        engine = InferenceEngine(cfg, **kw)

    backend = args.backend
    if backend == "auto":
        backend = "carla" if _carla_available() else "mock"
    if backend == "carla":
        sim = CarlaSim(
            host=args.host, port=args.port, town=args.town,
            fixed_dt=args.fixed_dt,
        )
    else:
        sim = MockSim(fixed_dt=args.fixed_dt)

    logs = run_closed_loop(
        engine,
        sim,
        steps=args.steps,
        fixed_dt=args.fixed_dt,
        lookahead_m=args.lookahead_m,
        default_start_kmh=args.default_start_kmh,
        bootstrap_steps=args.bootstrap_steps,
        kp=args.kp, ki=args.ki, kd=args.kd,
        out_dir=args.out_dir,
        save_frames=args.save_frames or args.export_gif,
        record_every=args.record_every,
    )
    if args.export_gif:
        export_gif(f"{args.out_dir}/frames", f"{args.out_dir}/run.gif")
    if hasattr(sim, "close"):
        sim.close()
    lat = [l["infer_ms"] for l in logs[5:]]
    print(
        json.dumps(
            {
                "steps": len(logs),
                "final_speed_kmh": logs[-1]["speed_kmh"] if logs else 0,
                "p50_infer_ms": float(np.percentile(lat, 50)) if lat else None,
            }
        )
    )


if __name__ == "__main__":
    main()
