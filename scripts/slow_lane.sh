#!/usr/bin/env bash
# Slow verification lane — the gated checks every normal suite run skips.
#
# Today that is:
#  * the v5e-8 deviceless AOT remat-memory pin
#    (tests/test_remat.py::test_aot_v5e_remat_memory_cut — two AOT
#    compiles of the full drivable train step, ~10 min, uncacheable
#    because this jax can't deserialize AOT executables);
#  * the pipeline-parallel growth-path HBM proof
#    (tests/test_deep_policy.py::test_aot_v5e_pp_memory_growth_path —
#    the 64-block/512ch deep-policy config that exceeds one v5e's
#    16 GiB but fits 8-stage pipelined, by XLA memory analysis);
#  * the convergence-outcome parity run (tests/test_torch_train_parity
#    .py::test_drivable_convergence_outcome_parity — ~200 SGD steps on
#    BOTH the real reference BDDTrainer and our Trainer to convergence,
#    final mIoU/pixel-acc equal under both eval recipes; r5,
#    VERDICT r4 item 3).
# Add future slow AOT pins here. NOTE: deviceless TPU topologies grab
# the libtpu lockfile — run while no real-TPU job is active.
#
# Run it:  bash scripts/slow_lane.sh          (~20-50 min, CPU only;
#          the PP growth-path compile alone took 12.5 min on 2026-08-19
#          under load — hence the generous 3300 s pytest budget)
# Cadence: once per round, and whenever remat, the AOT pins, or the
# toolchain change. Results append to benchmarks/slow_lane.log with a
# date stamp; the latest numbers are quoted in benchmarks/BENCHMARKS.md
# ("Slow AOT lane" section). VERDICT r3 item 6.
set -uo pipefail
cd "$(dirname "$0")/.."

LOG=benchmarks/slow_lane.log
{
  echo "=== slow_lane $(date -u +%Y-%m-%dT%H:%M:%SZ) $(git rev-parse --short HEAD 2>/dev/null || echo nogit) ==="
  RUN_SLOW_AOT=1 RUN_SLOW_CONVERGENCE=1 timeout 4500 python -m pytest \
    "tests/test_remat.py::test_aot_v5e_remat_memory_cut" \
    "tests/test_deep_policy.py::test_aot_v5e_pp_memory_growth_path" \
    "tests/test_torch_train_parity.py::test_drivable_convergence_outcome_parity" \
    -rA -q -s 2>&1 | grep -v "cpu_aot_loader\|machine features"
  echo "exit=$?"
} | tee -a "$LOG"
