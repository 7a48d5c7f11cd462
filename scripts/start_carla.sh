#!/usr/bin/env bash
# Launch a headless CARLA server under Xvfb (counterpart of the reference's
# scripts/start_carla.sh). Requires a CARLA install at $CARLA_ROOT.
set -euo pipefail
CARLA_ROOT="${CARLA_ROOT:-/opt/carla}"
PORT="${PORT:-2000}"
QUALITY="${QUALITY:-Low}"
if [ ! -x "$CARLA_ROOT/CarlaUE4.sh" ]; then
  echo "CARLA not found at $CARLA_ROOT (set CARLA_ROOT)" >&2
  exit 1
fi
command -v Xvfb >/dev/null || { echo "Xvfb required for headless run" >&2; exit 1; }
Xvfb :1 -screen 0 1280x720x24 &
XVFB_PID=$!
trap 'kill $XVFB_PID 2>/dev/null || true' EXIT
DISPLAY=:1 "$CARLA_ROOT/CarlaUE4.sh" -quality-level="$QUALITY" \
  -carla-rpc-port="$PORT" -nosound "$@"
