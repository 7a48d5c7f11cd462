"""Waymo E2E camera-TFRecord subset downloader.

Parity with reference scripts/download_waymo_e2e_subset.py:30-66 (gsutil
listing + subset copy; the data is unused downstream in the reference
too). Gated on gsutil being installed and GCS credentials; zero-egress
environments get a clear error instead of a hang.
"""
from __future__ import annotations

import argparse
import shutil
import subprocess
from pathlib import Path

BUCKET = "gs://waymo_open_dataset_end_to_end_camera_v_1_0_0"


def list_bucket(prefix: str = "") -> list[str]:
    if shutil.which("gsutil") is None:
        raise SystemExit("gsutil not installed; cannot access the Waymo bucket")
    out = subprocess.run(
        ["gsutil", "ls", f"{BUCKET}/{prefix}"],
        capture_output=True, text=True, check=True,
    )
    return [l for l in out.stdout.splitlines() if l.strip()]


def download_subset(n_files: int, out_dir: str) -> int:
    files = [f for f in list_bucket() if f.endswith(".tfrecord")][:n_files]
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    for f in files:
        subprocess.run(["gsutil", "cp", f, out_dir], check=True)
    return len(files)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-files", type=int, default=10)
    p.add_argument("--out-dir", default="datasets/waymo/raw")
    args = p.parse_args(argv)
    n = download_subset(args.n_files, args.out_dir)
    print(f"downloaded {n} TFRecords to {args.out_dir}")


if __name__ == "__main__":
    main()
