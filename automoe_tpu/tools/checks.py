"""Environment/dataset sanity checks.

Counterparts of the reference's utility scripts (SURVEY.md §2.1 S7):
  * check_nuscenes — dataset availability scan (scripts/check_nuscenes.py)
  * check_carla    — simulator connectivity ping (scripts/test_carla.py)
  * check_tpu      — device/runtime probe (new: the TPU replaces the GPU)
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def check_nuscenes(dataroot: str, version: str) -> dict:
    root = Path(dataroot)
    report = {
        "dataroot": str(root),
        "version": version,
        "exists": root.exists(),
        "tables_present": False,
        "n_sweeps_files": 0,
        "devkit_available": False,
    }
    tables = root / version
    if tables.exists():
        expected = {"scene.json", "sample.json", "sample_data.json"}
        present = {p.name for p in tables.glob("*.json")}
        report["tables_present"] = expected.issubset(present)
    sweeps = root / "sweeps"
    if sweeps.exists():
        report["n_sweeps_files"] = sum(1 for _ in sweeps.rglob("*") if _.is_file())
    try:
        import nuscenes  # noqa: F401

        report["devkit_available"] = True
    except ImportError:
        pass
    return report


def check_carla(host: str, port: int, timeout: float = 5.0) -> dict:
    report = {"host": host, "port": port, "client_installed": False,
              "server_reachable": False, "version": None}
    try:
        import carla
    except ImportError:
        return report
    report["client_installed"] = True
    try:
        client = carla.Client(host, port)
        client.set_timeout(timeout)
        report["version"] = client.get_server_version()
        report["server_reachable"] = True
    except RuntimeError:
        pass
    return report


def check_tpu() -> dict:
    import jax

    devices = jax.devices()
    report = {
        "backend": jax.default_backend(),
        "n_devices": len(devices),
        "devices": [str(d) for d in devices],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    report["matmul_ok"] = bool(jnp.isfinite(jnp.dot(x, x)).all())
    return report


def main(argv=None):
    p = argparse.ArgumentParser("automoe-check")
    sub = p.add_subparsers(dest="cmd", required=True)
    pn = sub.add_parser("nuscenes")
    pn.add_argument("--dataroot",
                    default=os.environ.get("NUSC_DATAROOT", "datasets/nuscenes/raw"))
    pn.add_argument("--version",
                    default=os.environ.get("NUSC_VERSION", "v1.0-mini"))
    pc = sub.add_parser("carla")
    pc.add_argument("--host", default="127.0.0.1")
    pc.add_argument("--port", type=int, default=2000)
    sub.add_parser("tpu")
    args = p.parse_args(argv)

    if args.cmd == "nuscenes":
        out = check_nuscenes(args.dataroot, args.version)
    elif args.cmd == "carla":
        out = check_carla(args.host, args.port)
    else:
        out = check_tpu()
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
