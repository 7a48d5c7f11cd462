#!/usr/bin/env bash
# Multi-run CARLA collection schedule with resume (counterpart of the
# reference's scripts/run_carla_scripts.sh).
set -euo pipefail
RUNS="${RUNS:-30}"
CONTINUE_FROM="${CONTINUE_FROM:-1}"
OUTPUT="${OUTPUT:-datasets/carla/raw}"
python -m automoe_tpu.tools.collect_carla \
  --runs "$RUNS" --continue-from "$CONTINUE_FROM" --output "$OUTPUT" "$@"
